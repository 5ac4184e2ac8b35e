"""Core method components: latent sampling, losses, training statistics."""

from warpedganspace_tpu.core.sampling import sample_z, sample_batch_directives
from warpedganspace_tpu.core.stats import TrainingStatTracker

__all__ = ["sample_z", "sample_batch_directives", "TrainingStatTracker"]
