import time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from wass_tpu.testing import make_scene, make_rig
from wass_tpu.match.pipeline import MatchConfig, match_frame

W, H = 1024, 768
rig = make_rig(width=W, height=H)
s = make_scene(seed=100, width=W, height=H, wave_amplitude=0.25, rig=rig, time=0.0)
cfg = MatchConfig(num_features=1500, iidyn_iters=6000, max_rounds=10,
                  hessian_threshold=3e-5, feature_grid_cell=8)
t0=time.time()
res = match_frame(s.img0, s.img1, rig.K0, rig.K1, cfg)
print(f"match {time.time()-t0:.1f}s n={res.n_matches} epi={res.epi_avg:.3f}")
print("dR", np.abs(res.R-rig.R).max(), "dT", np.abs(res.T.ravel()-rig.T/np.linalg.norm(rig.T)).max())
