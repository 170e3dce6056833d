from .dataset import ArrayDataset, as_array_dataset  # noqa: F401
from .splits import split_by_class  # noqa: F401
from .imagenet import ImageNetFolder, load_imagenet, read_synset_mapping, default_transform  # noqa: F401
from .pipeline import prefetch_to_device  # noqa: F401
