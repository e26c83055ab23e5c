from .dedup import exact_dedup, minhash_signatures, lsh_candidate_pairs, simhash64  # noqa: F401
from .similarity import brute_force_topk, lsh_index, lsh_topk  # noqa: F401
