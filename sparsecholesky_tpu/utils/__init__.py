from . import io, pprint  # noqa: F401
