from .checkpoint import ArtifactCache, load_artifact, save_artifact  # noqa: F401
from .import_reference import (  # noqa: F401
    import_adil,
    import_adilr,
    import_uap,
    import_universal,
)
from .metrics_log import MetricLogger  # noqa: F401
from .profiling import StepTimer, annotate, trace  # noqa: F401
from .rng import key_seq  # noqa: F401
