from flowdenoising_tpu.ops.pallas.sample import bilinear_displace_pallas, pallas_supported

__all__ = ["bilinear_displace_pallas", "pallas_supported"]
