from minddet_tpu.models.necks.ct_deconv import CenterNetDeconvNeck  # noqa: F401
