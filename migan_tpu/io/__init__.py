from .torch_import import (
    load_torch_state_dict,
    import_migan_inference,
    export_migan_inference,
    import_migan_train,
    export_migan_train,
)
from .checkpoint import save_npz, load_npz

__all__ = [
    "load_torch_state_dict", "import_migan_inference",
    "export_migan_inference", "import_migan_train", "export_migan_train",
    "save_npz", "load_npz",
]
