from amanogawa_spark.operators.etl import branch_columns, key_join, row_filter
from amanogawa_spark.operators.sampling import (
    hash_sample,
    host_disjoint_split,
    mixture_plan,
    stratified_sample,
    weighted_reservoir,
)
from amanogawa_spark.operators.packing import pack_sequences
from amanogawa_spark.operators.quality import (
    c4_line_filter,
    perplexity_buckets,
    redact_pii,
    repetition_features,
)
from amanogawa_spark.operators.sketch import (
    cms_query,
    cms_registers,
    hll_distinct,
    hll_registers,
)
from amanogawa_spark.operators.boilerplate import (
    boilerplate_chunks,
    chunk_table,
    remove_boilerplate,
)
from amanogawa_spark.operators.lexicon import (
    blocklist_filter,
    lexicon_hits,
)
from amanogawa_spark.operators.pca import (
    covariance_table,
    gram_stats,
    pca_fit,
    pca_project,
)
from amanogawa_spark.operators.chunking import (
    cdc_chunks,
    cdc_dup_stats,
    chunk_documents,
)
from amanogawa_spark.operators.ordering import (
    clustered,
    clustered_write,
    layout_size_probe,
    locality_sort_keys,
)
from amanogawa_spark.operators.bpe import bpe_encode, bpe_train
from amanogawa_spark.operators.cooccur import cooccurrence_pairs, pmi_scores
from amanogawa_spark.operators.retrieval import (
    bm25_scores,
    phrase_search,
    positional_postings,
    posting_lists,
    rrf_fuse,
)
from amanogawa_spark.operators.classifier import calibration_bins
from amanogawa_spark.operators.semdedup import semdedup
from amanogawa_spark.operators.bloom import bloom_build, bloom_contains, bloom_merge
from amanogawa_spark.operators.dedup import (
    incremental_exact_dedup,
    incremental_minhash_dedup,
    lsh_plan,
    mirror_hosts,
    pick_bands,
    winnow_candidates,
    winnow_fingerprints,
)
from amanogawa_spark.operators.recrawl import change_rates, revisit_schedule
from amanogawa_spark.operators.snapshots import content_churn, moved_content
from amanogawa_spark.operators.pq import ivf_pq_topk, pq_adc_topk, pq_encode, pq_train
from amanogawa_spark.operators.stats import (
    exact_quantiles,
    grouped_quantiles,
    numeric_histogram,
    powerlaw_alpha,
)
from amanogawa_spark.operators.bitext import hreflang_clusters, hreflang_edges
from amanogawa_spark.operators.dedup import canonical_dedup, host_dup_profile
from amanogawa_spark.operators.bow import subword_ngrams

__all__ = [
    "hreflang_clusters",
    "hreflang_edges",
    "canonical_dedup",
    "host_dup_profile",
    "subword_ngrams",
    "branch_columns",
    "key_join",
    "row_filter",
    "hash_sample",
    "mixture_plan",
    "host_disjoint_split",
    "weighted_reservoir",
    "stratified_sample",
    "pack_sequences",
    "c4_line_filter",
    "perplexity_buckets",
    "redact_pii",
    "repetition_features",
    "cms_query",
    "cms_registers",
    "hll_distinct",
    "hll_registers",
    "boilerplate_chunks",
    "blocklist_filter",
    "lexicon_hits",
    "cdc_chunks",
    "clustered",
    "clustered_write",
    "layout_size_probe",
    "locality_sort_keys",
    "cdc_dup_stats",
    "covariance_table",
    "gram_stats",
    "pca_fit",
    "pca_project",
    "chunk_documents",
    "chunk_table",
    "remove_boilerplate",
    "bpe_train",
    "bpe_encode",
    "cooccurrence_pairs",
    "pmi_scores",
    "phrase_search",
    "positional_postings",
    "content_churn",
    "moved_content",
    "bloom_build",
    "calibration_bins",
    "bloom_contains",
    "bloom_merge",
    "incremental_exact_dedup",
    "incremental_minhash_dedup",
    "lsh_plan",
    "mirror_hosts",
    "pick_bands",
    "winnow_candidates",
    "winnow_fingerprints",
    "change_rates",
    "revisit_schedule",
    "bm25_scores",
    "posting_lists",
    "rrf_fuse",
    "semdedup",
    "pq_train",
    "pq_encode",
    "pq_adc_topk",
    "ivf_pq_topk",
    "exact_quantiles",
    "grouped_quantiles",
    "powerlaw_alpha",
    "numeric_histogram",
]
