"""Spectrum plotting (wasspost/plotting.py:4-29 equivalent)."""

from __future__ import annotations

import numpy as np


def plot_spectrum(f: np.ndarray, S: np.ndarray, out_path, title: str = "Wave spectrum"):
    """loglog PSD plot with peak annotation; saves to out_path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(10, 6))
    m = (f > 0) & (S > 0)
    plt.loglog(f[m], S[m], "-k", linewidth=1.2)
    ip = int(np.argmax(S[m]))
    fp = f[m][ip]
    plt.axvline(fp, color="r", linestyle="--", linewidth=0.8)
    plt.annotate(f"fp = {fp:.3f} Hz", (fp, S[m][ip]), textcoords="offset points", xytext=(8, -4))
    plt.xlabel("frequency (Hz)")
    plt.ylabel("S(f)  (m$^2$/Hz)")
    plt.title(title)
    plt.grid(True, which="both", alpha=0.3)
    fig.savefig(out_path, bbox_inches="tight", dpi=120)
    plt.close(fig)
