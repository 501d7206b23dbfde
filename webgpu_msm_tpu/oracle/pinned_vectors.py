"""Pinned full-size expected MSM results — this repo's testCases.ts analog.

The reference pins expected affine results for its 2^16..2^20 fixtures
(src/test-data/testCases.ts:12-31); those input files are unhydrated Git
LFS pointer stubs in our checkout, so they cannot be reproduced
bit-for-bit. This file pins OUR deterministic full-size fixtures instead.
Inputs regenerate exactly from seeds:

    points  = fixtures.distinct_points_fast(1 << power, seed=power)
    scalars = fixtures.random_scalars(1 << power, seed=1000 + power)

Expected values were produced by the TPU engine (v5e, one chip) and — as
of round 5 — EVERY power is verified by two implementations that share no
code with the TPU engine: the native C++ engine (runtime/csrc/msm_cpu.cpp,
run single-thread and multi-thread) and the pure-Python bigint oracle
(scripts/verify_pinned.py; artifact PINNED_VERIFY_r05.json, all ok=true).
That matches the reference's provenance standard, where pinned results
come from an oracle independent of the submission under test
(src/test-data/testCases.ts:12-31, README.md:108). Regenerate with
scripts/pin_vectors.py; re-verify independence with:

    python scripts/verify_pinned.py
"""

# power -> (x, y) affine expected result
PINNED: dict[int, tuple[int, int]] = {
    16: (
        4206070117347591455635929580110646977248956481820458334086453876827128277930,
        1792646811397490322971495589664595373892556814921895124457142651273725088711,
    ),
    17: (
        3434811657721270904485417853842700999336797771536998588733707448336125299020,
        2043902210927734422696244032831923116260206104354825262044897743874613859930,
    ),
    18: (
        6786157953051517635732966197291439764067522974966897707040008091903784061873,
        5684663799638565415930856649714235630701931902159290053964518562564006986851,
    ),
    19: (
        6644291405244299627380851645132838298104101280974835420025820158087283078319,
        8263826552356320236982734528300655002070327704700567206384083164926563490719,
    ),
    20: (
        1411369535658589462203010136651326658420231779471893605656004446378621621272,
        7133762707083376519932240192264510142782851326672072846742390907081393209419,
    ),
}
