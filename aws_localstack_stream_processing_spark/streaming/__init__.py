from . import dlq, jobs, keyring, source  # noqa: F401
