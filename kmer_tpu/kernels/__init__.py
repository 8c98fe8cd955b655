from . import encode, hash64, kmer, u64  # noqa: F401
