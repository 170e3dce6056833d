from .checkpoint import ArtifactCache, load_artifact, save_artifact  # noqa: F401
from .metrics_log import MetricLogger  # noqa: F401
from .profiling import StepTimer, annotate, trace  # noqa: F401
from .rng import key_seq  # noqa: F401
