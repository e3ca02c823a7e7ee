"""wass-tpu-post: the wasspost console equivalent.

Click command group over gridded.nc cubes mirroring the reference
(/root/reference/postproc/wasspost/wasspost.py): info, filter,
spatial_lowpass, spectrum, spectrum3d, setfps, zeromean, clip,
visibilitymap.
"""

from __future__ import annotations

from pathlib import Path

import click
import numpy as np


@click.group()
def cli():
    """Post-processing analytics over gridded.nc wave cubes."""


def _open(ncfile, mode="r"):
    import h5py

    return h5py.File(ncfile, mode)


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
def info(ncfile):
    with _open(ncfile) as f:
        click.echo(f"Variables in {ncfile}:")
        def show(name, obj):
            import h5py

            if isinstance(obj, h5py.Dataset):
                click.echo(f"  {name}: shape={obj.shape} dtype={obj.dtype}")
        f.visititems(show)
        if "meta" in f:
            for k, v in f["meta"].attrs.items():
                click.echo(f"  meta.{k} = {v}")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.option("--cutoff", type=float, default=1.0, help="filter cutoff in Hz")
@click.option("--lowpass", "kind", flag_value="lowpass", default=True)
@click.option("--highpass", "kind", flag_value="highpass")
@click.option("--filter-variable", default="Z")
def filter(ncfile, cutoff, kind, filter_variable):
    """Zero-phase temporal Butterworth (wasspost `filter`/`filter_fast`)."""
    from wass_tpu.post.filters import temporal_butterworth

    with _open(ncfile, "r+") as f:
        fps = float(f["meta"].attrs.get("fps", 1.0))
        Z = f[filter_variable][...]
        out = temporal_butterworth(Z, fps=fps, cutoff_hz=cutoff, kind=kind)
        name = filter_variable + "_filtered"
        if name in f:
            del f[name]
        f.create_dataset(name, data=out.astype(np.float32), chunks=f[filter_variable].chunks)
    click.echo(f"wrote {name}")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.option("--cutoff-in-hz", type=float, default=1.0)
@click.option("--filter-variable", default="Z")
def spatial_lowpass(ncfile, cutoff_in_hz, filter_variable):
    from wass_tpu.post.filters import spatial_butterworth_lowpass

    with _open(ncfile, "r+") as f:
        XX = f["X_grid"][...] / 1000.0
        du = abs(XX[1, 0] - XX[0, 0]) or abs(XX[0, 1] - XX[0, 0])
        Z = f[filter_variable][...]
        out = spatial_butterworth_lowpass(Z, du=du, cutoff=cutoff_in_hz)
        name = filter_variable + "_slp"
        if name in f:
            del f[name]
        f.create_dataset(name, data=out.astype(np.float32))
    click.echo(f"wrote {name}")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.option("--nperseg", type=int, default=512)
@click.option("--rangespan", type=int, default=5)
@click.option("--variable", default="Z")
def spectrum(ncfile, nperseg, rangespan, variable):
    """Welch frequency spectrum + integral wave parameters."""
    from wass_tpu.post.spectra import compute_spectrum, spectrum_stats

    with _open(ncfile) as f:
        fps = float(f["meta"].attrs.get("fps", 1.0))
        Z = f[variable][...] / 1000.0  # mm -> m
        fr, S, _ = compute_spectrum(Z, dt=1.0 / fps, nperseg=nperseg, rangespan=rangespan)
        st = spectrum_stats(fr, S)
        click.echo(f"Hm0  = {st.hm0:.3f} m")
        click.echo(f"Tm01 = {st.tm01:.3f} s")
        click.echo(f"Tp   = {st.tp:.3f} s (fp = {st.fp:.4f} Hz)")
        out = Path(ncfile).with_suffix(".spectrum.csv")
        np.savetxt(out, np.c_[fr, S], delimiter=";", header="f_Hz;S_m2_per_Hz")
        click.echo(f"spectrum saved to {out}")
        try:
            from wass_tpu.post.plotting import plot_spectrum

            png = Path(ncfile).with_suffix(".spectrum.png")
            plot_spectrum(fr, S, png)
            click.echo(f"plot saved to {png}")
        except Exception as e:
            click.echo(f"(plot skipped: {e})")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.option("--segments", type=int, default=10)
def spectrum3d(ncfile, segments):
    from wass_tpu.post.spectra import compute_3d_spectrum

    with _open(ncfile) as f:
        fps = float(f["meta"].attrs.get("fps", 1.0))
        XX = f["X_grid"][...] / 1000.0
        du = abs(XX[1, 0] - XX[0, 0]) or abs(XX[0, 1] - XX[0, 0])
        Z = f["Z"][...] / 1000.0
        S, KX, KY, fr = compute_3d_spectrum(Z, du=du, dt=1.0 / fps, segments=segments)
        out = Path(ncfile).with_suffix(".spectrum3d.npz")
        np.savez_compressed(out, S=S, KX=KX, KY=KY, f=fr)
        click.echo(f"3D spectrum saved to {out}")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.argument("fps", type=float)
def setfps(ncfile, fps):
    with _open(ncfile, "r+") as f:
        f["meta"].attrs["fps"] = fps
        if "time" in f and "count" in f:
            n = f["count"].shape[0]
            f["time"][...] = np.arange(n) / fps
    click.echo(f"fps set to {fps}")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.option("--variable", default="Z")
def zeromean(ncfile, variable):
    from wass_tpu.post.filters import zero_mean

    with _open(ncfile, "r+") as f:
        Z = f[variable][...]
        f[variable][...] = zero_mean(Z)
    click.echo("per-point temporal mean removed")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.option("--variable", default="Z")
@click.option("--zmin", type=float, required=True)
@click.option("--zmax", type=float, required=True)
def clip(ncfile, variable, zmin, zmax):
    with _open(ncfile, "r+") as f:
        Z = f[variable][...]
        f[variable][...] = np.clip(Z, zmin, zmax)
    click.echo(f"clipped {variable} to [{zmin}, {zmax}]")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.option("--frame", type=int, default=0)
def visibilitymap(ncfile, frame):
    """Occlusion mask toward camera 0 for one frame (wasspost
    `visibilitymap`, wasspost.py:502-621)."""
    from wass_tpu.post.geometry import compute_occlusion_mask

    with _open(ncfile, "r+") as f:
        Z = f["Z"][frame] / 1000.0
        XX = f["X_grid"][...] / 1000.0
        YY = f["Y_grid"][...] / 1000.0
        # Camera position in grid frame from Cam0toGrid.
        C = f["meta"]["Cam0toGrid"][...] @ np.array([0.0, 0, 0, 1])
        C = C[:3] / C[3]
        rays = np.dstack([C[0] - XX, C[1] - YY, np.maximum(C[2] - Z, 1e-3)])
        occ = compute_occlusion_mask(Z, rays)
        name = f"occlusion_{frame:06d}"
        if name in f:
            del f[name]
        f.create_dataset(name, data=occ)
    click.echo(f"wrote {name} ({occ.mean()*100:.1f}% occluded)")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.argument("srcvar")
@click.argument("dstvar")
def renamevar(ncfile, srcvar, dstvar):
    with _open(ncfile, "r+") as f:
        f[dstvar] = f[srcvar]
        del f[srcvar]
    click.echo(f"renamed {srcvar} -> {dstvar}")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.option("--cam", type=int, default=0)
@click.option("--wassdir", type=click.Path(exists=True), default=None, help="sequence dir with *_wd workdirs")
@click.option("--numframes", type=int, default=0)
@click.option("--zvariable", default="Z")
def radiance(ncfile, cam, wassdir, numframes, zvariable):
    """Remap camera images onto the elevation grid (-> /radiance_camN)."""
    from wass_tpu.post.radiance import radiance_frame
    from wass_tpu.io.workdir import frame_workdirs

    with _open(ncfile, "r+") as f:
        Pplane = f["meta"][f"P{cam}plane"][...]
        XX = f["X_grid"][...] / 1000.0
        YY = f["Y_grid"][...] / 1000.0
        Z = f[zvariable]
        N = numframes if numframes > 0 else Z.shape[0]
        name = f"radiance_cam{cam}"
        if name in f:
            del f[name]
        out = f.create_dataset(name, shape=(N,) + Z.shape[1:], dtype="f4", chunks=f[zvariable].chunks)
        wds = frame_workdirs(wassdir) if wassdir else None
        for i in range(N):
            if wds is not None:
                img = wds[i].load_undistorted(cam)
            else:
                import imageio.v3 as iio

                img = iio.imread(bytes(f["cam0images"][i]))
            out[i] = radiance_frame(img, f[zvariable][i] / 1000.0, XX, YY, Pplane)
    click.echo(f"wrote radiance_cam{cam} ({N} frames)")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.option("--cam", type=int, default=0)
@click.option("--filtersize", type=int, default=200)
def bgimage(ncfile, cam, filtersize):
    """Time-wise box filter of /radiance_camN -> /radiance_bgimage_camN."""
    from wass_tpu.post.radiance import bg_radiance

    with _open(ncfile, "r+") as f:
        src = f[f"radiance_cam{cam}"][...]
        name = f"radiance_bgimage_cam{cam}"
        if name in f:
            del f[name]
        f.create_dataset(name, data=bg_radiance(src, filtersize))
    click.echo(f"wrote {name}")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.option("--cam", type=int, default=0)
@click.option("--threshold-val", type=float, default=0.35)
@click.option("--use-vats", is_flag=True, default=False)
def radiance_threshold(ncfile, cam, threshold_val, use_vats):
    """Background-subtracted binarization -> /radiance_thresholded_camN."""
    from wass_tpu.post.radiance import radiance_threshold as rt

    with _open(ncfile, "r+") as f:
        rad = f[f"radiance_cam{cam}"][...]
        bg = f[f"radiance_bgimage_cam{cam}"][...]
        name = f"radiance_thresholded_cam{cam}"
        if name in f:
            del f[name]
        f.create_dataset(name, data=rt(rad, bg, threshold_val, use_vats))
    click.echo(f"wrote {name}")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.option("--cam", type=int, default=0)
@click.option("--wassdir", type=click.Path(exists=True), required=True)
@click.option("--outputdir", type=click.Path(), required=True)
@click.option("--numframes", type=int, default=0)
def polarimetric_setup(ncfile, cam, wassdir, outputdir, numframes):
    """Grid-sampled Stokes / normals / incidence averages for polarimetric
    processing (wasspost `polarimetric_setup`, wasspost.py:634-805).
    Requires Stokes tiffs from the prepare stage (save_stokes=True)."""
    import imageio.v3 as iio
    from wass_tpu.io.workdir import frame_workdirs
    from wass_tpu.post.polarimetric import PolarimetricAccumulator, accumulate_frame

    out = Path(outputdir)
    out.mkdir(parents=True, exist_ok=True)
    wds = frame_workdirs(wassdir)
    with _open(ncfile) as f:
        Pplane = f["meta"][f"P{cam}plane"][...]
        Cam2Grid = f["meta"][f"Cam{cam}toGrid"][...]
        XX = f["X_grid"][...] / 1000.0
        YY = f["Y_grid"][...] / 1000.0
        Z = f["Z"]
        N = numframes if numframes > 0 else min(Z.shape[0], len(wds))
        cam_origin = Cam2Grid @ np.array([0.0, 0, 0, 1])
        cam_origin = cam_origin[:3] / cam_origin[3]

        acc = PolarimetricAccumulator.zeros(XX.shape)
        for i in range(N):
            pre = wds[i].path / "undistorted" / f"{cam:08d}"
            S0 = iio.imread(f"{pre}_S0.tiff")
            S1 = iio.imread(f"{pre}_S1.tiff")
            S2 = iio.imread(f"{pre}_S2.tiff")
            acc = accumulate_frame(
                acc, Z[i] / 1000.0, XX, YY, S0, S1, S2, Pplane, cam_origin
            )
    Savg, Navg, Zavg, inc = acc.finalize()
    np.savez(out / "pdata_avg", Savg=Savg, Navg_grid=Navg, Zavg=Zavg,
             incidence_avg=inc, Cam2Grid=Cam2Grid)
    click.echo(f"polarimetric averages over {N} frames saved to {out/'pdata_avg.npz'}")


def main():
    cli()


if __name__ == "__main__":
    main()
