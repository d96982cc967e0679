from revisit_anything_tpu.retrieval.matching import (
    get_matches_host, weighted_borda_predict, first_k_unique)
from revisit_anything_tpu.retrieval.recall import (
    calc_recall, calculate_map, top_k_recall)
