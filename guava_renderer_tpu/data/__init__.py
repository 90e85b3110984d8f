from .loader import PrefetchLoader  # noqa: F401
from .store import RecordStore, RecordStoreWriter  # noqa: F401
from .tracked import TrackedVideoDataset, build_dataset  # noqa: F401
