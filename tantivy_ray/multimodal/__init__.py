from .audio import (  # noqa: F401
    DecodeAudioStage,
    ExtractAudioFeaturesStage,
    audio_features,
    decode_wav,
    encode_wav,
)
from .codecs import decode_image  # noqa: F401
from .stages import (  # noqa: F401
    DecodeImageStage,
    ExtractImageFeaturesStage,
    FrameSampleStage,
    ResizeImageStage,
    fake_decode_rgb,
)
