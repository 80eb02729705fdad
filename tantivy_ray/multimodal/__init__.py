from .stages import (  # noqa: F401
    DecodeImageStage,
    ExtractImageFeaturesStage,
    FrameSampleStage,
    ResizeImageStage,
    fake_decode_rgb,
)
