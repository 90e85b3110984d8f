from .deformer import deform_avatar  # noqa: F401
from .inferer import InfererConfig, UbodyGaussianInferer, build_avatar  # noqa: F401
from .renderer import GaussianRenderer, RenderOutputs  # noqa: F401
from .state import GaussianAvatar, GaussianSet, prune_avatar  # noqa: F401
