from wass_tpu.parallel.mesh import make_frame_mesh, frame_sharding  # noqa: F401
