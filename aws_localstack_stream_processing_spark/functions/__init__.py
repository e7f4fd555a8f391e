from . import hashing, text  # noqa: F401
