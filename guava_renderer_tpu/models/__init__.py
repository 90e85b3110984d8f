from .decoders import UVPointGSDecoder, VertexGSDecoder  # noqa: F401
from .dpt_encoder import DinoDPTEncoder  # noqa: F401
from .styleunet import SimpleUNet, StyleUNet  # noqa: F401
from .vit import VisionTransformer  # noqa: F401

# neural-refiner registry (ref: models/modules/net_module/__init__.py:3-6)
NEURAL_REFINERS = {
    "styleunet": StyleUNet,
    "simpleunet": SimpleUNet,
}
