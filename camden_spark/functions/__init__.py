from camden_spark.functions.hashing import (
    minhash_signatures_np,
    shingle_hashes_np,
    simhash_np,
    token_hashes,
)

__all__ = [
    "token_hashes",
    "shingle_hashes_np",
    "minhash_signatures_np",
    "simhash_np",
]
