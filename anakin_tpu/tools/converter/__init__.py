from .torch_frontend import from_torch  # noqa: F401
