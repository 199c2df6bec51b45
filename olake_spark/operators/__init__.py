"""Maintenance + training-data operators. Public surface:

    from olake_spark.operators import (
        run_compaction, run_cluster_rewrite, merge_into, rewrite_manifests,
        run_expire, dedup_exact, jaccard_pairs, minhash_lsh_pairs,
        simhash_pairs, embedding_near_dup, knn_bruteforce, knn_lsh,
    )
"""

from olake_spark.operators.ann import knn_bruteforce, knn_lsh  # noqa: F401
from olake_spark.operators.cluster import run_cluster_rewrite  # noqa: F401
from olake_spark.operators.compact import (plan_compaction,  # noqa: F401
                                           purge_dead_deletes, run_compaction)
from olake_spark.operators.dedup import (dedup_exact,  # noqa: F401
                                         embedding_near_dup, jaccard_pairs,
                                         minhash_lsh_pairs, simhash_pairs)
from olake_spark.operators.expire import run_expire  # noqa: F401
from olake_spark.operators.manifests import rewrite_manifests  # noqa: F401
from olake_spark.operators.merge import (apply_changes_oracle,  # noqa: F401
                                         dedup_changes, merge_into)
