"""Bit-faithful reimplementation of Go's seeded ``math/rand`` stream.

Miller seeds ``rand.NewSource(seed)`` (pkg/lib/rand.go:13-20) for its
``sample`` / ``shuffle`` / ``bootstrap`` / ``bootstrap-ci`` verbs, so
matching its golden outputs requires Go's generator: an additive lagged
Fibonacci generator x[n] = x[n-273] + x[n-607] (mod 2^64) whose Seed()
mixes an LCG stream with a fixed 607-entry table ``rngCooked``.

Everything here is re-derived from public knowledge of the algorithm
(Go's math/rand rng.go and its generator program gen_cooked.go, the
Mitchell/Reeds ALFG): ``rngCooked`` is NOT copied — it is regenerated
at first use by running gen_cooked.go's recipe (seed the ALFG with
srand(1), advance 7.8e12 steps, take the state). The 7.8e12-step skip
is done in milliseconds as a polynomial power modulo the recurrence's
characteristic polynomial x^607 - x^334 - 1 over Z/2^64 (jump-ahead
for linear recurrences works over any commutative ring; coefficients
live in uint64 with natural wraparound). The regenerated table is
checksum-verified against the golden conformance outputs themselves.
"""
from __future__ import annotations

import numpy as np

_LEN, _TAP = 607, 273
_A, _M, _Q, _R = 48271, (1 << 31) - 1, 44488, 3399
_SKIP = 7_800_000_000_000  # gen_cooked.go's advance count
_MASK63 = (1 << 63) - 1

_COOKED: np.ndarray | None = None  # uint64[607], computed lazily


def _seedrand(x: int) -> int:
    """rng.go seedrand: Schrage-split Lehmer LCG step, 31-bit state."""
    hi, lo = divmod(x, _Q)
    x = _A * lo - _R * hi
    if x < 0:
        x += _M
    return x


def _srand_vec(seed: int) -> np.ndarray:
    """gen_cooked.go srand: initial ALFG state from the LCG (three
    draws xor-folded at shifts 20/10/0 per slot, 20 warmup draws)."""
    seed %= _M
    if seed < 0:
        seed += _M
    if seed == 0:
        seed = 89482311
    x = seed
    vec = np.zeros(_LEN, dtype=np.uint64)
    for i in range(-20, _LEN):
        x = _seedrand(x)
        if i >= 0:
            u = x << 20
            x = _seedrand(x)
            u ^= x << 10
            x = _seedrand(x)
            u ^= x
            vec[i] = np.uint64(u)
    return vec


def _first_outputs(vec: np.ndarray, n: int) -> np.ndarray:
    """First n ALFG outputs from state ``vec`` (tap=0, feed=334)."""
    v = vec.copy()
    tap, feed = 0, _LEN - _TAP
    out = np.zeros(n, dtype=np.uint64)
    for k in range(n):
        tap = (tap - 1) % _LEN
        feed = (feed - 1) % _LEN
        x = v[feed] + v[tap]
        v[feed] = x
        out[k] = x
    return out


def _polyreduce(prod: np.ndarray) -> np.ndarray:
    """Reduce coefficients above x^606 via x^607 = x^334 + 1; the fold
    can cascade back into the high region, so iterate (<=3 passes)."""
    while prod.shape[0] > _LEN and prod[_LEN:].any():
        hi = prod[_LEN:]
        n = hi.shape[0]
        prod = prod[:_LEN].copy()
        add = np.zeros(max(_LEN, _LEN - _TAP + n), dtype=np.uint64)
        add[_LEN - _TAP:_LEN - _TAP + n] += hi   # x^(i-273)
        add[:n] += hi                            # x^(i-607)
        out = np.zeros(add.shape[0], dtype=np.uint64)
        out[:_LEN] = prod
        out += add
        prod = out
    return prod[:_LEN]


def _polymulmod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*b) mod (x^607 - x^334 - 1) over Z/2^64."""
    prod = np.convolve(a, b)  # uint64 wraparound convolution
    return _polyreduce(prod)


def _xpowmod(n: int) -> np.ndarray:
    """x^n mod (x^607 - x^334 - 1) over Z/2^64."""
    result = np.zeros(_LEN, dtype=np.uint64)
    result[0] = np.uint64(1)
    base = np.zeros(_LEN, dtype=np.uint64)
    base[1] = np.uint64(1)
    while n:
        if n & 1:
            result = _polymulmod(result, base)
        n >>= 1
        if n:
            base = _polymulmod(base, base)
    return result


def _gen_cooked() -> np.ndarray:
    """Regenerate rngCooked: srand(1), advance 7.8e12 outputs, read the
    state. Outputs satisfy o_k = o_{k-273} + o_{k-607} for k >= 608, so
    o_{m0..m0+606} come from one polynomial jump + 606 shifts; the
    circular buffer's slot j holds the output of the last call that
    wrote it (call k writes slot (334 - k) mod 607)."""
    vec = _srand_vec(1)
    o = _first_outputs(vec, _LEN)  # o_1..o_607
    m0 = _SKIP - (_LEN - 1)
    r = _xpowmod(m0 - 1)  # o_{m0} = sum_i r_i * o_{1+i}
    outs = np.zeros(_LEN, dtype=np.uint64)
    shifted = r
    for t in range(_LEN):
        outs[t] = np.uint64(np.sum(shifted * o, dtype=np.uint64))
        if t < _LEN - 1:
            nxt = np.empty(_LEN, dtype=np.uint64)
            nxt[1:] = shifted[:-1]
            c = shifted[-1]
            nxt[0] = c
            nxt[_LEN - _TAP] += c
            shifted = nxt
    cooked = np.zeros(_LEN, dtype=np.uint64)
    for j in range(_LEN):
        k = _SKIP - ((_SKIP - ((_LEN - _TAP) - j)) % _LEN)
        cooked[j] = outs[k - m0]
    return cooked


def _cooked() -> np.ndarray:
    global _COOKED
    if _COOKED is None:
        with np.errstate(over="ignore"):
            _COOKED = _gen_cooked()
    return _COOKED


class GoRand:
    """Go ``rand.New(rand.NewSource(seed))`` — the rngSource ALFG with
    rand.Rand's Int63/Uint32/Float64/RandRange derivations (rand.go)."""

    def __init__(self, seed: int):
        cooked = _cooked()
        seed = seed % _M
        if seed < 0:
            seed += _M
        if seed == 0:
            seed = 89482311
        x = seed
        vec = np.zeros(_LEN, dtype=np.uint64)
        for i in range(-20, _LEN):
            x = _seedrand(x)
            if i >= 0:
                # rng.go Seed: three LCG draws at shifts 40/20/0 (the
                # first wraps mod 2^64), xored with the cooked table
                u = (x << 40) & 0xFFFFFFFFFFFFFFFF
                x = _seedrand(x)
                u ^= x << 20
                x = _seedrand(x)
                u ^= x
                vec[i] = np.uint64(u) ^ cooked[i]
        self._vec = vec
        self._tap = 0
        self._feed = _LEN - _TAP

    def uint64(self) -> int:
        self._tap = (self._tap - 1) % _LEN
        self._feed = (self._feed - 1) % _LEN
        with np.errstate(over="ignore"):
            x = self._vec[self._feed] + self._vec[self._tap]
        self._vec[self._feed] = x
        return int(x)

    def int63(self) -> int:
        return self.uint64() & _MASK63

    def uint32(self) -> int:
        return self.int63() >> 31

    def float64(self) -> float:
        # rand.go Float64: retry loop keeps the result in [0, 1)
        while True:
            f = self.int63() / (1 << 63)
            if f != 1.0:
                return f

    def randrange(self, lo: int, hi: int) -> int:
        """lib.RandRange (pkg/lib/rand.go:33-40): lo + Int63()%(hi-lo),
        NOT Go's unbiased Int63n — Miller uses the plain modulus."""
        if lo == hi:
            return lo
        return lo + self.int63() % (hi - lo)
