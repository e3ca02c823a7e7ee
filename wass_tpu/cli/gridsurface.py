"""wass-tpu-gridsurface: the wassgridsurface console equivalent.

Mirrors the reference CLI contract
(/root/reference/gridding/wassgridsurface/wassgridsurface.py:596-768):
--action setup computes the grid geometry (config.mat), --action grid
rasterizes every frame into gridded.nc.
"""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np


@click.command()
@click.argument("workdir", type=click.Path(exists=True))
@click.argument("outdir", type=click.Path())
@click.option("--action", type=click.Choice(["setup", "grid"]), required=True)
@click.option("--baseline", type=float, default=None, help="camera baseline in meters")
@click.option("--gridsetup", type=click.Path(), default=None, help="config.mat from a previous setup")
@click.option("--area_center", type=str, default="0,0")
@click.option("--area_size", type=float, default=50.0)
@click.option("-N", "--grid_size", type=int, default=256)
@click.option("--fps", type=float, default=1.0)
@click.option("--algorithm", "--ia", type=click.Choice(["DCT", "IDW", "LinearND"]), default="DCT")
@click.option("--subsample", type=float, default=100.0, help="point subsample percentage")
@click.option("-mf", "--medianfilter", type=int, default=0)
@click.option("--filter-outliers", is_flag=True, default=False,
              help="local-plane outlier voting before gridding (filter_mesh_outliers)")
@click.option("--force-zero-mean", is_flag=True, default=False,
              help="chunked per-point temporal zero-mean rewrite after gridding")
@click.option("--no-images", is_flag=True, default=False,
              help="skip pushing JPEG cam frames into the cube")
@click.option("--refine", "variational", is_flag=True, default=False,
              help="photo-consistency surface refinement (experimental; "
                   "the reference's TFVariationalRefinement)")
@click.option("--mask", "mask_file", type=click.Path(exists=True), default=None,
              help="user grid mask: grayscale image of the grid size; zero pixels are "
                   "excluded from every frame (reference --mask, wassgridsurface.py:640)")
def cli(workdir, outdir, action, baseline, gridsetup, area_center, area_size, grid_size, fps, algorithm, subsample, medianfilter, filter_outliers, force_zero_mean, no_images, variational, mask_file):
    from wass_tpu.io.workdir import frame_workdirs
    from wass_tpu.grid.setup import grid_setup
    from wass_tpu.grid.gridding import GridConfig, grid_sequence

    out = Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    wds = frame_workdirs(workdir)
    if not wds:
        raise click.ClickException(f"no *_wd frame directories under {workdir}")

    # Mean plane over the sequence (wassgridsurface.py:664-678).
    planes_file = Path(workdir) / "output" / "planes.txt"
    if planes_file.exists():
        meanplane = np.nanmean(np.loadtxt(planes_file, ndmin=2), axis=0)
    else:
        meanplane = wds[0].load_plane()

    if action == "setup":
        if baseline is None:
            raise click.ClickException("--baseline is required for setup")
        cx, cy = (float(v) for v in area_center.split(","))
        setup = grid_setup(
            wds[0], meanplane, baseline,
            area_center=(cx, cy), area_size_x=area_size, area_size_y=area_size,
            Nx=grid_size, Ny=grid_size, fps=fps,
        )
        setup.save_mat(out / "config.mat")
        _save_area_plot(wds[0], setup, meanplane, out)
        click.echo(f"grid setup saved to {out/'config.mat'}")
        return

    # action == grid
    import scipy.io as sio

    matfile = Path(gridsetup) if gridsetup else out / "config.mat"
    if not matfile.exists():
        raise click.ClickException(f"{matfile} not found; run --action setup first")
    from wass_tpu.grid.setup import GridSetup

    m = sio.loadmat(str(matfile))
    setup = GridSetup(
        XX=m["XX"], YY=m["YY"], KX_ab=m["KX_ab"], KY_ab=m["KY_ab"],
        Rpl=m["Rpl"], Tpl=m["Tpl"],
        P0cam=np.vstack([m["P0cam"], [0, 0, 0, 1]]), P1cam=np.vstack([m["P1cam"], [0, 0, 0, 1]]),
        P0plane=m["P0plane"], P1plane=m["P1plane"],
        Cam0toGrid=m["Cam0toGrid"], Cam1toGrid=m["Cam1toGrid"],
        K0=m["K0"], K1=m["K1"], baseline=float(np.ravel(m["CAM_BASELINE"])[0]),
        xmin=float(np.ravel(m["xmin"])[0]), xmax=float(np.ravel(m["xmax"])[0]),
        ymin=float(np.ravel(m["ymin"])[0]), ymax=float(np.ravel(m["ymax"])[0]),
        zmin=float(np.ravel(m["zmin"])[0]), zmax=float(np.ravel(m["zmax"])[0]),
        x_spacing=float(np.ravel(m["x_spacing"])[0]), y_spacing=float(np.ravel(m["y_spacing"])[0]),
        fps=float(np.ravel(m["fps"])[0]),
    )
    cfg = GridConfig(
        algorithm=algorithm, subsample_percent=subsample,
        median_filter_size=medianfilter, filter_outliers=filter_outliers,
        force_zero_mean=force_zero_mean, save_images=not no_images,
        variational=variational,
    )
    user_mask = None
    if mask_file is not None:
        import imageio.v3 as iio

        user_mask = (np.asarray(iio.imread(mask_file)) > 0).astype(np.float32)
        if user_mask.ndim == 3:
            user_mask = user_mask[..., 0]
        if user_mask.shape != setup.XX.shape:
            raise click.ClickException(
                f"--mask shape {user_mask.shape} != grid {setup.XX.shape}"
            )
    grid_sequence(wds, setup, out / "gridded.nc", cfg, user_mask=user_mask,
                  diag_dir=out)
    click.echo(f"gridded {len(wds)} frames into {out/'gridded.nc'}")


def _save_area_plot(wd, setup, meanplane, out: Path) -> None:
    """area_grid.png: point cloud + grid footprint sanity check
    (wassgridsurface.py:176-190)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from wass_tpu.io.xyzc import load_camera_mesh
        from wass_tpu.grid.setup import align_on_sea_plane

        mesh = load_camera_mesh(wd.path / "mesh_cam.xyzC")
        ma = align_on_sea_plane(mesh, meanplane) * setup.baseline
        fig = plt.figure(figsize=(12, 12))
        plt.scatter(ma[0, ::50], ma[1, ::50], c=ma[2, ::50], vmin=setup.zmin, vmax=setup.zmax, s=1)
        plt.gca().invert_yaxis()
        plt.colorbar()
        plt.plot(
            [setup.xmin, setup.xmax, setup.xmax, setup.xmin, setup.xmin],
            [setup.ymin, setup.ymin, setup.ymax, setup.ymax, setup.ymin],
            "-k", linewidth=2,
        )
        plt.axis("equal")
        plt.title(f"WASS point cloud {wd.path}")
        plt.grid(True, which="both", alpha=0.3)
        fig.savefig(out / "area_grid.png", bbox_inches="tight", dpi=100)
        plt.close(fig)
    except Exception as e:  # diagnostics must never fail the stage
        click.echo(f"(area plot skipped: {e})")


def main():
    cli()


if __name__ == "__main__":
    main()
