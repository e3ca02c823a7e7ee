from wass_tpu.testing.synthetic import SyntheticScene, SyntheticRig, make_scene, make_rig  # noqa: F401
