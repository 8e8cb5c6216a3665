from odibel_spark.functions.text import (  # noqa: F401
    document_fingerprint,
    language_id,
    quality_score,
    token_count,
)
from odibel_spark.functions.dedup import (  # noqa: F401
    benchmark_contamination,
    embedding_near_duplicates,
    exact_duplicates,
    minhash_signatures,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    word_shingles,
)
from odibel_spark.functions.dedup_incremental import (  # noqa: F401
    incremental_near_duplicates,
    minhash_index,
)
from odibel_spark.functions.corpus import prepare_training_corpus  # noqa: F401
from odibel_spark.functions.packing import pack_documents  # noqa: F401
from odibel_spark.functions.similarity import (  # noqa: F401
    cosine_top_k,
    ivf_centroids,
    ivf_top_k,
)
