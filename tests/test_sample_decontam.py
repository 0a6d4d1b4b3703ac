"""Stratified sampling and n-gram decontamination vs brute oracles."""

import numpy as np
import pyarrow as pa
import ray.data

from igraph_ray.functions.dedup import ngram_contamination
from igraph_ray.stages.sample import stratified_sample
from igraph_ray.utils import hash_int64
from tests.util import ds_to_table


def test_stratified_sample():
    n = 200
    ids = np.arange(n, dtype=np.int64)
    langs = np.array(["en", "de", "fr"], object)[ids % 3]
    ds = ray.data.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids), "lang": pa.array(langs, pa.string())}
        )
    ).repartition(4)
    out = ds_to_table(
        stratified_sample(ds, group_col="lang", key_col="doc_id", k=4)
    )
    got = set(
        zip(out.column("lang").to_pylist(), out.column("doc_id").to_pylist())
    )
    z = hash_int64(ids)
    want = set()
    for lang in ("en", "de", "fr"):
        m = langs == lang
        order = np.lexsort((ids[m], z[m]))
        for i in ids[m][order][:4]:
            want.add((lang, int(i)))
    assert got == want
    assert len(got) == 12


def test_ngram_contamination():
    docs = [
        (0, "a b c d e f"),          # benchmark doc (id % 3 == 0)
        (1, "a b c d e f g"),        # shares 2 distinct 4-grams w/ 0+3
        (2, "x y z w k m"),          # clean (no benchmark 4-gram)
        (3, "q r s t u v"),          # benchmark doc
        (4, "u v"),                  # too short for any 4-gram
        (5, "q r s t u v q r s t u v"),  # repeats: distinct hits only
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in docs], pa.int64()),
                "text": pa.array([d[1] for d in docs], pa.string()),
            }
        )
    ).repartition(3)

    def bench(batch):
        return batch.column("doc_id").to_numpy(zero_copy_only=False) % 3 == 0

    out = ds_to_table(ngram_contamination(ds, bench_filter=bench, n=4))
    got = {
        d: (h, c)
        for d, h, c in zip(
            out.column("doc_id").to_pylist(),
            out.column("n_hits").to_pylist(),
            out.column("contaminated").to_pylist(),
        )
    }

    def grams(text, n=4):
        w = text.lower().split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    bench_g = grams(docs[0][1]) | grams(docs[3][1])
    for did, text in docs:
        hits = len(grams(text) & bench_g)
        assert got[did] == (hits, int(hits > 0)), did
    assert got[2] == (0, 0) and got[4] == (0, 0)
    assert got[1][1] == 1 and got[5][1] == 1


def test_mixture_sample():
    import numpy as np

    from igraph_ray.stages.sample import mixture_sample
    from igraph_ray.utils import hash_int64

    n = 1000
    rng = np.random.default_rng(5)
    doc_id = np.arange(n, dtype=np.int64)
    lang = rng.choice(["en", "de", "zz"], n)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(doc_id), "lang": pa.array(lang)})
    ).repartition(4)
    rates = {"en": (9, 10), "de": (3, 10)}  # zz -> default drop
    out = ds_to_table(mixture_sample(ds, "lang", "doc_id", rates))
    got = set(out.column("doc_id").to_pylist())
    z = hash_int64(doc_id) % np.uint64(10)
    want = set()
    for d, lg, zz in zip(doc_id, lang, z):
        num = {"en": 9, "de": 3}.get(lg, 0)
        if zz < num:
            want.add(int(d))
    assert got == want
    # determinism across block layouts
    out2 = ds_to_table(
        mixture_sample(ds.repartition(9), "lang", "doc_id", rates)
    )
    assert set(out2.column("doc_id").to_pylist()) == want
