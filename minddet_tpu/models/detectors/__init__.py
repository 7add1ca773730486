from minddet_tpu.models.detectors.centernet import CenterNet  # noqa: F401
