from druglamp_tpu.parallel.mesh import MeshContext, make_mesh  # noqa: F401
