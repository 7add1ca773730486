from minddet_tpu.models.readers.pillar_encoder import (  # noqa: F401
    PillarFeatureNet,
    PointPillarsScatter,
)
