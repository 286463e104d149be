"""Engine-registered SQL functions that Spark lacks natively."""

from .ch_hashes import register_all  # noqa: F401
