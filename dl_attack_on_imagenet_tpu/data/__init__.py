from .dataset import ArrayDataset, as_array_dataset  # noqa: F401
from .splits import split_by_class  # noqa: F401
