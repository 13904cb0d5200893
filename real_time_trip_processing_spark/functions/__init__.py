from . import minhash, scalar, similarity, text  # noqa: F401
