from .pandas_oracle import run_oracle  # noqa: F401
