from flowdenoising_tpu.parallel.mesh import denoise_sharded, make_mesh, halo_exchange

__all__ = ["denoise_sharded", "make_mesh", "halo_exchange"]
