import time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from wass_tpu.testing import make_scene, make_rig
from wass_tpu.match.pipeline import MatchConfig, match_frame
from wass_tpu.stereo.dense import DenseStereoConfig, dense_stereo_frame

W, H = 1024, 768
rig = make_rig(width=W, height=H)
t0=time.time()
s = make_scene(seed=100, width=W, height=H, wave_amplitude=0.25, rig=rig, time=0.0)
print(f"scene {time.time()-t0:.1f}s")
t0=time.time()
res = match_frame(s.img0, s.img1, rig.K0, rig.K1, MatchConfig())
print(f"match {time.time()-t0:.1f}s n={res.n_matches} epi={res.epi_avg:.3f}")
print("dR", np.abs(res.R-rig.R).max(), "dT", np.abs(res.T.ravel()-rig.T/np.linalg.norm(rig.T)).max())
t0=time.time()
out, geom = dense_stereo_frame(s.img0, s.img1, rig.K0, rig.K1, rig.R, rig.T,
    DenseStereoConfig(num_disp=128, min_disp=1, plane_ransac_threshold=0.1, plane_max_distance=0.3))
import jax
jax.block_until_ready(out.points)
print(f"dense {time.time()-t0:.1f}s npts={int(out.n_points)}")
pts = np.asarray(out.points)[np.asarray(out.valid)]
err = s.elevation_error(pts, np.asarray(out.plane))
ae = np.sort(np.abs(err[np.isfinite(err)]))
print("elev err (GT extr):", ae[:int(len(ae)*0.999)].mean())
