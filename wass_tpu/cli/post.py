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
@click.option("--overwrite", is_flag=True, default=False)
def filter(ncfile, cutoff, kind, filter_variable, overwrite):
    """Zero-phase temporal Butterworth (wasspost `filter`/`filter_fast`,
    wasspost.py:157-251).  Out-of-core: spatial blocks stream through the
    filter with the full time axis per block (the reference's 'crucial'
    count=-1 chunking), under the WASS_POST_MEMORY_MB budget."""
    from wass_tpu.post.filters import temporal_butterworth
    from wass_tpu.post.ooc import apply_timewise

    with _open(ncfile, "r+") as f:
        if f[filter_variable].shape[0] <= 10:
            # Reference contract (wasspost.py:171-173).
            raise click.ClickException(
                "Dataset too short. I need more than 10 frames for lowpass filtering"
            )
        fps = float(f["meta"].attrs.get("fps", 1.0))
        name = filter_variable if overwrite else filter_variable + "_filtered"
        apply_timewise(
            f, filter_variable, name,
            lambda blk: temporal_butterworth(
                blk, fps=fps, cutoff_hz=cutoff, kind=kind
            ).astype(np.float32),
            dtype="f4",
        )
        f[name].attrs["frequency_filter_cutoff"] = cutoff
    click.echo(f"wrote {name}")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.option("--cutoff-in-hz", type=float, default=1.0)
@click.option("--filter-variable", default="Z")
def spatial_lowpass(ncfile, cutoff_in_hz, filter_variable):
    """Frame-wise radial 2D Butterworth (wasspost `spatial_lowpass`,
    wasspost.py:323-371); streams over time slabs."""
    from wass_tpu.post.filters import spatial_butterworth_lowpass
    from wass_tpu.post.ooc import apply_framewise

    with _open(ncfile, "r+") as f:
        XX = f["X_grid"][...] / 1000.0
        du = abs(XX[1, 0] - XX[0, 0]) or abs(XX[0, 1] - XX[0, 0])
        name = filter_variable + "_slp"
        apply_framewise(
            f, filter_variable, name,
            lambda blk: spatial_butterworth_lowpass(
                blk, du=du, cutoff=cutoff_in_hz
            ).astype(np.float32),
            dtype="f4",
        )
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
        # The h5py dataset is passed directly: compute_spectrum slices only
        # the center patch, so arbitrarily long cubes never load fully.
        fr, S, _ = compute_spectrum(
            f[variable], dt=1.0 / fps, nperseg=nperseg, rangespan=rangespan,
            scale=1e-3,  # mm -> m
        )
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
        # Out-of-core: compute_3d_spectrum reads one Welch time segment at
        # a time from the h5py dataset.
        S, KX, KY, fr = compute_3d_spectrum(
            f["Z"], du=du, dt=1.0 / fps, segments=segments, datascale=1e-3
        )
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
    """Per-point temporal zero-mean, chunked (two streaming passes like
    the reference's chunked HDF5 zeromean, wasspost.py:965-1005)."""
    from wass_tpu.post.ooc import apply_framewise, streaming_time_mean

    with _open(ncfile, "r+") as f:
        mean = streaming_time_mean(f[variable]).astype(np.float32)
        apply_framewise(f, variable, variable, lambda blk: blk - mean[None])
    click.echo("per-point temporal mean removed")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.option("--variable", default="Z")
@click.option("--zmin", type=float, required=True)
@click.option("--zmax", type=float, required=True)
def clip(ncfile, variable, zmin, zmax):
    from wass_tpu.post.ooc import apply_framewise

    with _open(ncfile, "r+") as f:
        apply_framewise(f, variable, variable, lambda blk: np.clip(blk, zmin, zmax))
    click.echo(f"clipped {variable} to [{zmin}, {zmax}]")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.option("--cam", type=int, default=0)
@click.option("--numframes", type=int, default=-1, help="-1 = all frames")
@click.option("--outputdir", type=click.Path(), default=None,
              help="also write per-frame occlusion PNGs here")
def visibilitymap(ncfile, cam, numframes, outputdir):
    """Occlusion masks + incidence angles toward camera N for the whole
    sequence (wasspost `visibilitymap`, wasspost.py:502-621): each frame
    slab runs as ONE device program (ray march + incidence batched over
    frames — the reference batches frames across a thread pool instead,
    wasspost.py:617-621), writes /occlusion_camN (u1) and
    /incident_angles_camN (f4); incidence >= 88 deg counts as occluded."""
    from wass_tpu.post.geometry import compute_visibility_batch
    from wass_tpu.post.ooc import iter_time_slabs

    with _open(ncfile, "r+") as f:
        Z = f["Z"]
        N = Z.shape[0] if numframes < 0 else min(numframes, Z.shape[0])
        XX = f["X_grid"][...] / 1000.0
        YY = f["Y_grid"][...] / 1000.0
        dx = abs(XX[0, 1] - XX[0, 0]) or abs(XX[1, 0] - XX[0, 0])
        C = f["meta"][f"Cam{cam}toGrid"][...] @ np.array([0.0, 0, 0, 1])
        C = C[:3] / C[3]

        from wass_tpu.post.ooc import clamp_chunks

        occ_name = f"occlusion_cam{cam}"
        inc_name = f"incident_angles_cam{cam}"
        for name, dt in ((occ_name, "u1"), (inc_name, "f4")):
            if name in f:
                del f[name]
        ck = clamp_chunks(Z.chunks, Z.shape)
        occ_ds = f.create_dataset(occ_name, shape=Z.shape, dtype="u1", chunks=ck)
        inc_ds = f.create_dataset(inc_name, shape=Z.shape, dtype="f4", chunks=ck)

        total_occ = 0
        for ts in iter_time_slabs((N,) + Z.shape[1:], 8):
            zz_slab = np.asarray(Z[ts], np.float64) / 1000.0
            occ_b, inc_b = compute_visibility_batch(zz_slab, XX, YY, C, dx)
            occ_ds[ts] = occ_b
            inc_ds[ts] = inc_b
            total_occ += int(occ_b.sum())
            if outputdir is not None:
                from wass_tpu.utils.render import _save

                Path(outputdir).mkdir(parents=True, exist_ok=True)
                for k in range(occ_b.shape[0]):
                    i = (ts.start or 0) + k
                    _save(
                        Path(outputdir) / f"{i:08d}_occlusion_mask_cam{cam}.png",
                        occ_b[k] * 255,
                    )
        denom = N * Z.shape[1] * Z.shape[2]
    click.echo(
        f"wrote {occ_name} + {inc_name} over {N} frames "
        f"({100.0 * total_occ / max(denom, 1):.1f}% occluded)"
    )


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
    """Time-wise box filter of /radiance_camN -> /radiance_bgimage_camN
    (wasspost `bgimage`, wasspost.py:1014-1074).  Out-of-core: spatial
    blocks with the full time axis stream through the same reflect-mode
    uniform filter the reference applies via dask map_overlap."""
    from wass_tpu.post.radiance import bg_radiance
    from wass_tpu.post.ooc import apply_timewise

    with _open(ncfile, "r+") as f:
        name = f"radiance_bgimage_cam{cam}"
        apply_timewise(
            f, f"radiance_cam{cam}", name,
            lambda blk: bg_radiance(blk, filtersize).astype(np.float32),
            dtype="f4",
        )
    click.echo(f"wrote {name}")


@cli.command()
@click.argument("ncfile", type=click.Path(exists=True))
@click.option("--cam", type=int, default=0)
@click.option("--threshold-val", type=float, default=0.35)
@click.option("--use-vats", is_flag=True, default=False)
def radiance_threshold(ncfile, cam, threshold_val, use_vats):
    """Background-subtracted binarization -> /radiance_thresholded_camN
    (wasspost.py:1084-1145, per-frame VATS preserved); streams over time
    slabs."""
    from wass_tpu.post.radiance import radiance_threshold as rt
    from wass_tpu.post.ooc import iter_time_slabs

    with _open(ncfile, "r+") as f:
        rad = f[f"radiance_cam{cam}"]
        bg = f[f"radiance_bgimage_cam{cam}"]
        name = f"radiance_thresholded_cam{cam}"
        if name in f:
            del f[name]
        out = f.create_dataset(name, shape=rad.shape, dtype="u1", chunks=rad.chunks)
        for ts in iter_time_slabs(rad.shape, rad.dtype.itemsize, n_buffers=4):
            r = np.asarray(rad[ts], np.float32)
            b = np.asarray(bg[ts], np.float32)
            out[ts] = rt(r, b, threshold_val, use_vats=use_vats)
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
