from .torch_import import (
    load_torch_state_dict,
    import_migan_inference,
)

__all__ = ["load_torch_state_dict", "import_migan_inference"]
