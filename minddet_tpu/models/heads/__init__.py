from minddet_tpu.models.heads.centernet_head import CenterNetHead  # noqa: F401
