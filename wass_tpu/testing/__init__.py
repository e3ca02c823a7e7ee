from wass_tpu.testing.synthetic import SyntheticScene, SyntheticRig, make_scene  # noqa: F401
