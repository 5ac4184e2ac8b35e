"""Model zoo: support sets, reconstructors, frozen GAN generators."""

from warpedganspace_tpu.models.support_sets import SupportSets
from warpedganspace_tpu.models.reconstructor import Reconstructor

__all__ = ["SupportSets", "Reconstructor"]
