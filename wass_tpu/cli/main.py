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
        f"epipolar error {res.epi_avg_before:.4f} -> {res.epi_avg_after:.4f} px "
        f"({res.n_inliers} inliers, {'accepted' if res.improved else 'kept RANSAC pose'})"
    )


@cli.command()
@click.argument("outdir", type=click.Path(exists=True))
def stereo(outdir):
    """Dense reconstruction of every frame (wass_stereo)."""
    planes = _load_pipeline(outdir).stereo()
    click.echo(f"reconstructed {len(planes)} frames")


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
