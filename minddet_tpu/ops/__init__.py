from minddet_tpu.ops import box  # noqa: F401
