"""Training-data pipeline operations over the documents / embeddings
tables: deduplication (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (language-ID, quality scoring, token counting,
fingerprinting), and multimodal binary-column plumbing.

These are first-class components of the engine (not demos): every
operator is a declarative DataFrame transformation designed for the
100 TB case — shuffle-free signature computation, banded-LSH joins
instead of O(n^2) cross joins, broadcast query vectors.
"""

from .text import (
    rolling_hash,
    production_hash,
    tokens_col,
    token_count,
    bpe_ish_token_count,
    quality_metrics,
    quality_score,
    lang_id_scores,
    lang_id,
    assign_split,
    doc_fingerprint,
    split_bucket,
    stratified_sample,
    sample_to_token_budget,
    shuffle_for_training,
)
from .components import connected_components, near_dup_survivors
from .packing import pack_chunks, chunk_stats
from .pii import PII_PATTERNS, pii_counts, total_pii_count, redact_pii
from .repetition import (
    GOPHER_THRESHOLDS,
    repetition_metrics,
    repetition_metrics_py,
    gopher_repetition_filter,
)
from .lm import (
    LM_ALPHA,
    train_bigram_lm,
    perplexity,
    perplexity_buckets,
    perplexity_filter,
)
from .decontam import (
    DEFAULT_DECONTAM_N,
    eval_ngram_set,
    eval_short_widths,
    contamination,
    decontaminate,
)
from .dedup import (
    exact_dedup_clusters,
    chunk_hash_col,
    chunk_dedup_stats,
    minhash_signature,
    lsh_band_keys,
    minhash_lsh_pairs,
    minhash_index,
    minhash_lsh_pairs_incremental,
    simhash,
    simhash_exploded_bands,
    simhash_lsh_pairs,
    hamming_distance,
    ngram_jaccard_pairs,
    embedding_near_dup_pairs,
    make_hyperplanes,
    hyperplane_bits_for,
)
from .similarity import (
    cosine_similarity,
    brute_force_topk,
    hyperplane_signature,
    ann_lsh_topk,
    ivf_train_centroids,
    ivf_topk,
)
from .multimodal import (
    MEDIA_SCHEMA,
    synthesize_media,
    synthesize_coded_media,
    extract_features,
    decode_media,
    decode_bmp,
    encode_bmp,
    decode_wav,
    encode_wav,
    frame_sample,
)
