"""IVF index persistence (similarity.save_ivf_index / load_ivf_index):
searching a reloaded index returns exactly the fresh trained-index search
results, and the bucket files are partitioned by centroid id so probes
prune directories.
"""

from __future__ import annotations

import os

from incubator_horaedb_spark.operators import similarity
from incubator_horaedb_spark.operators.dialect import SPARK
from incubator_horaedb_spark.plans.metrics import scan_counters
from incubator_horaedb_spark.querybank import llm_ops


def test_ivf_index_save_load_roundtrip(spark, sf_dir, tmp_path):
    r = similarity.KM_ROUNDS
    # fresh: train + search over session views
    fresh = llm_ops._staged_ann_ivf_trained(spark, sf_dir).collect()

    # build the persistable index from the trained views: inverted lists =
    # final assignment joined with corpus norms
    buckets = spark.sql(
        f"SELECT a.vec_id, a.cid, a.q, v.nrm FROM __km_a{r} a "
        f"JOIN __km_qv v ON v.vec_id = a.vec_id"
    )
    path = str(tmp_path / "ivf_index")
    similarity.save_ivf_index(spark.table(f"__km_cent{r}"), buckets, path)

    cent, loaded_buckets = similarity.load_ivf_index(spark, path)
    cent.createOrReplaceTempView("__ld_cent")
    loaded_buckets.createOrReplaceTempView("__ld_buckets")
    searched = spark.sql(
        SPARK.cte_query(
            similarity.km_search_index_ctes(
                SPARK, "__km_qv", "__ld_buckets", "__ld_cent",
                k=5, n_probe=2, n_queries=10,
            ),
            "SELECT qid, vec_id, cosine FROM ranked WHERE rn <= 5",
        )
    ).collect()

    assert sorted(map(tuple, searched)) == sorted(map(tuple, fresh))
    # inverted lists are partitioned by centroid id on disk
    assert any(d.startswith("cid=") for d in os.listdir(f"{path}/buckets"))


def test_ivf_index_probe_prunes_buckets(spark, sf_dir, tmp_path):
    r = similarity.KM_ROUNDS
    llm_ops._staged_ivf_kmeans(spark, sf_dir).collect()
    buckets = spark.sql(
        f"SELECT a.vec_id, a.cid, a.q, v.nrm FROM __km_a{r} a "
        f"JOIN __km_qv v ON v.vec_id = a.vec_id"
    )
    path = str(tmp_path / "ivf_index2")
    similarity.save_ivf_index(spark.table(f"__km_cent{r}"), buckets, path)
    _, loaded = similarity.load_ivf_index(spark, path)
    n_buckets = len([d for d in os.listdir(f"{path}/buckets") if d.startswith("cid=")])
    one = loaded.filter("cid = (SELECT min(cid) FROM parquet.`" + path + "/buckets`)")
    counters = scan_counters(one)
    assert counters and counters[0]["partitions_read"] == 1  # pruned to one bucket
    assert n_buckets > 1
