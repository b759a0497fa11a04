from .serialize import load_model, save_model  # noqa: F401
