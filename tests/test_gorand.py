"""Go math/rand reproduction (miller_ray/gorand.py): the regenerated
rngCooked table and the seeded output stream must match Go exactly —
pinned here against values observable from the reference's own golden
outputs (verb-sample/shuffle/bootstrap suites replay them end-to-end
in test_conformance.py; this file pins the primitives)."""

import numpy as np

from miller_ray import gorand


def test_rngcooked_regeneration_checksum():
    cooked = gorand._cooked()
    assert cooked.shape == (607,)
    # rng.go's table starts with this value (public Go source); our
    # table is REGENERATED via gen_cooked.go's recipe, so equality here
    # proves the polynomial jump-ahead reproduced the reference run
    assert cooked.view(np.int64)[0] == -4181792142133755926


def test_seeded_stream_reproduces_golden_reservoir():
    # mlr --seed 12345 sample -k 2 test/input/abixy-het keeps records
    # 10 and 2 (verb-sample/0001/expout): replay the reservoir and the
    # exact Int63 draws it consumes
    r = gorand.GoRand(12345)
    k, bucket = 2, []
    for nr in range(1, 11):
        if len(bucket) < k:
            bucket.append(nr)
        else:
            x = r.int63() % nr
            if x < k:
                bucket[x] = nr
    assert bucket == [10, 2]


def test_seed_normalization_and_range():
    # seed 0 and seed 2^31-1 both normalize to 89482311 (rng.go Seed)
    a = gorand.GoRand(0)
    b = gorand.GoRand((1 << 31) - 1)
    assert [a.int63() for _ in range(3)] == [b.int63() for _ in range(3)]
    r = gorand.GoRand(7)
    for _ in range(100):
        v = r.int63()
        assert 0 <= v < (1 << 63)
        f = r.float64()
        assert 0.0 <= f < 1.0
    assert all(0 <= r.randrange(3, 9) - 3 < 6 for _ in range(50))
    assert r.randrange(4, 4) == 4
