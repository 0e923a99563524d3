from .torch_import import (
    load_torch_state_dict,
    import_migan_inference,
    export_migan_inference,
    import_migan_train,
    export_migan_train,
)
from .checkpoint import save_npz, load_npz
from .pkl_import import load_reference_snapshot, loads_reference_snapshot

__all__ = [
    "load_torch_state_dict", "import_migan_inference",
    "export_migan_inference", "import_migan_train", "export_migan_train",
    "save_npz", "load_npz",
    "load_reference_snapshot", "loads_reference_snapshot",
]
