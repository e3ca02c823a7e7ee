"""wass-tpu command-line interface (the wasscli equivalent).

The reference CLI (/root/reference/cli/wasscli/wasscli.py) is an
interactive menu that shells out to four executables.  Here the stages are
in-process library calls; the CLI exposes them as click subcommands plus a
`run` command covering the whole prepare -> match -> autocalibrate ->
stereo flow, and `genconfig` reproducing the --genconfig contract.
"""

from __future__ import annotations

import sys
from pathlib import Path

import click
import numpy as np


@click.group()
def cli():
    """wass_tpu: TPU-native sea-wave stereo reconstruction."""


def _load_pipeline(outdir):
    """Build the pipeline, loading any `{prepare,matcher,stereo}_config.txt`
    found in the sequence dir (the reference loads its config file at every
    stage startup, wass_stereo.cpp:1836-1856 / wass_match.cpp:148-169)."""
    from wass_tpu.cli.pipeline import SequenceConfig, SequencePipeline
    from wass_tpu.cli.options import (
        flow_config_from_registry,
        match_config_from_registry,
        prepare_config_from_registry,
        register_all,
        stereo_config_from_registry,
    )
    from wass_tpu.config import registry

    register_all()
    out = Path(outdir)
    for stage in ("prepare", "matcher", "stereo"):
        reg = registry(stage)
        reg.reset()  # don't leak values across sequences in one process
        cfgfile = out / f"{stage}_config.txt"
        if cfgfile.exists():
            reg.load_file(cfgfile)
    cfg = SequenceConfig(
        prepare=prepare_config_from_registry(),
        match=match_config_from_registry(),
        stereo=stereo_config_from_registry(),
        flow=flow_config_from_registry(),
    )
    return SequencePipeline(outdir, cfg)


def _read_gray(path):
    from wass_tpu import native

    if native.available() and str(path).lower().endswith(".png"):
        return native.png_read_gray(path).astype(np.float32)
    import imageio.v3 as iio

    img = iio.imread(path)
    if img.ndim == 3:
        img = img.mean(axis=-1)
    return img.astype(np.float32)


@cli.command()
@click.argument("cam0_dir", type=click.Path(exists=True))
@click.argument("cam1_dir", type=click.Path(exists=True))
@click.argument("calibdir", type=click.Path(exists=True))
@click.argument("outdir", type=click.Path())
@click.option("--continue-if-existing", is_flag=True, default=False)
def prepare(cam0_dir, cam1_dir, calibdir, outdir, continue_if_existing):
    """Prepare all frame pairs into workdirs (wass_prepare)."""
    from wass_tpu.cli.pipeline import SequencePipeline
    from wass_tpu.io.matrices import load_matrix
    from wass_tpu.utils.progress import progress

    calib = Path(calibdir)
    K0 = load_matrix(calib / "intrinsics_00.xml")
    K1 = load_matrix(calib / "intrinsics_01.xml")
    # Distortion files are optional (wass_prepare.cpp:433-443: "Assuming no
    # distortion" when absent).
    d0 = (load_matrix(calib / "distortion_00.xml").reshape(-1)
          if (calib / "distortion_00.xml").exists() else np.zeros(5))
    d1 = (load_matrix(calib / "distortion_01.xml").reshape(-1)
          if (calib / "distortion_01.xml").exists() else np.zeros(5))
    ext_R = ext_T = None
    if (calib / "ext_R.xml").exists():
        ext_R = load_matrix(calib / "ext_R.xml")
        ext_T = load_matrix(calib / "ext_T.xml")

    f0 = sorted(Path(cam0_dir).glob("*"))
    f1 = sorted(Path(cam1_dir).glob("*"))
    if len(f0) != len(f1):
        raise click.ClickException("camera folders contain different frame counts")

    pipe = SequencePipeline(outdir)
    frames = ((_read_gray(a), _read_gray(b)) for a, b in zip(f0, f1))
    for i, (img0, img1) in enumerate(frames):
        wd_path = pipe.outdir / f"{i:06d}_wd"
        if continue_if_existing and (wd_path / "undistorted" / "00000001.png").exists():
            continue
        from wass_tpu.prepare.prepare import prepare_frame

        prepare_frame(wd_path, img0, img1, K0, d0, K1, d1, pipe.cfg.prepare, ext_R, ext_T)
        progress(i + 1, len(f0))
    click.echo(f"prepared {len(f0)} frames into {outdir}")


@cli.command()
@click.argument("outdir", type=click.Path(exists=True))
def match(outdir):
    """Feature-match a random subset of frames (wass_match)."""
    n = _load_pipeline(outdir).match()
    click.echo(f"matched {n} frames")


@cli.command()
@click.argument("outdir", type=click.Path(exists=True))
def autocalibrate(outdir):
    """Sequence-wide extrinsic refinement (wass_autocalibrate)."""
    res = _load_pipeline(outdir).autocalibrate()
    if res is None:
        raise click.ClickException("autocalibration failed (no matches?)")
    click.echo(
        f"epipolar error {res.epi_med_before:.4f} -> {res.epi_med_after:.4f} px "
        f"({res.n_inliers} inliers, {'accepted' if res.improved else 'kept RANSAC pose'})"
    )


@cli.command()
@click.argument("outdir", type=click.Path(exists=True))
def stereo(outdir):
    """Dense reconstruction of every frame (wass_stereo)."""
    planes = _load_pipeline(outdir).stereo()
    click.echo(f"reconstructed {len(planes)} frames")


@cli.command()
@click.argument("workdir", type=click.Path(exists=True))
@click.argument("pixels", nargs=-1, type=float)
@click.option("--baseline", type=float, default=None,
              help="camera baseline in meters; scales the reported distance "
              "from baseline units to meters")
@click.option("--radius", type=float, default=10.0,
              help="max pixel distance between a requested pixel and the "
              "nearest reconstructed point")
@click.option("--interactive", is_flag=True, default=False,
              help="pick the two points by clicking on the cam0 image "
              "(requires a display)")
def measure(workdir, pixels, baseline, radius, interactive):
    """Two-point 3D distance on a reconstructed frame.

    The wass_stereo --measure workflow (wass_stereo.cpp:1934-1973): the
    reference pops an interactive PointPicker (PointPicker.hpp:24-189) over
    the stereo pair and reports the distance between two triangulated
    points.  Here the points are given as cam0 pixel coordinates
    `U0 V0 U1 V1` (or clicked via --interactive when a display exists);
    each is snapped to the nearest reconstructed mesh point reprojected
    through K0."""
    from wass_tpu.io.workdir import Workdir
    from wass_tpu.stereo.meshops import measure_distance

    wd = Workdir(Path(workdir))
    if interactive:
        import matplotlib.pyplot as plt

        img = wd.load_undistorted(0)
        fig, ax = plt.subplots()
        ax.imshow(img, cmap="gray")
        ax.set_title("click two points")
        picked = plt.ginput(2, timeout=0)
        plt.close(fig)
        if len(picked) != 2:
            raise click.ClickException("need exactly two clicked points")
        pixels = [c for uv in picked for c in uv]
    if len(pixels) != 4:
        raise click.ClickException("expected 4 coordinates: U0 V0 U1 V1 (or --interactive)")

    mesh = wd.load_mesh_cam()  # (3, N) cam0-frame, baseline units
    if mesh.shape[1] == 0:
        raise click.ClickException("empty mesh_cam.xyzC")
    K0 = wd.load_intrinsics(0)
    uv = (K0 @ mesh)
    uv = uv[:2] / uv[2:3]  # (2, N)

    picked_pts = []
    for (u, v) in ((pixels[0], pixels[1]), (pixels[2], pixels[3])):
        d2 = (uv[0] - u) ** 2 + (uv[1] - v) ** 2
        j = int(np.argmin(d2))
        if d2[j] > radius * radius:
            raise click.ClickException(
                f"no reconstructed point within {radius:g} px of ({u:g}, {v:g})"
            )
        p = mesh[:, j]
        click.echo(f"({u:g}, {v:g}) -> point #{j} at "
                   f"[{p[0]:.4f} {p[1]:.4f} {p[2]:.4f}] "
                   f"(reprojects to {uv[0][j]:.1f}, {uv[1][j]:.1f})")
        picked_pts.append(p)

    dist = float(measure_distance(picked_pts[0], picked_pts[1]))
    click.echo(f"distance: {dist:.6f} baseline units")
    if baseline is not None:
        click.echo(f"distance: {dist * baseline:.6f} m (baseline {baseline:g} m)")


@cli.command()
@click.argument("outdir", type=click.Path())
@click.option("--stage", type=click.Choice(["prepare", "matcher", "stereo"]), default="stereo")
def genconfig(outdir, stage):
    """Dump the commented key=value config of a stage (--genconfig)."""
    from wass_tpu.config import registry
    from wass_tpu.cli.options import register_all

    register_all()
    text = registry(stage).to_config_string()
    out = Path(outdir)
    if out.is_dir():
        out = out / f"{stage}_config.txt"
    out.write_text(text)
    click.echo(f"wrote {out}")


def main():
    cli()


if __name__ == "__main__":
    main()
