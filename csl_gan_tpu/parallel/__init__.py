from csl_gan_tpu.parallel.mesh import MeshContext, make_mesh
