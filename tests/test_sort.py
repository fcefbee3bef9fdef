import subprocess

import numpy as np
import pytest

from minigraph_tpu.utils.ksort import _py_radix_argsort, radix_argsort
from tests.conftest import REPO, REF_DIR

SORT_ORACLE_SRC = """
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include "{ksort}"
typedef struct {{ uint64_t x, y; }} p128_t;
#define skey(a) ((a).x)
KRADIX_SORT_INIT(t128, p128_t, skey, 8)
int main(void) {{
    long n;
    if (scanf("%ld", &n) != 1) return 1;
    p128_t *a = malloc(n * sizeof(p128_t));
    for (long i = 0; i < n; ++i) {{ scanf("%llu", (unsigned long long*)&a[i].x); a[i].y = i; }}
    radix_sort_t128(a, a + n);
    for (long i = 0; i < n; ++i) printf("%llu\\n", (unsigned long long)a[i].y);
    return 0;
}}
"""


@pytest.fixture(scope="module")
def sort_oracle():
    exe = REPO / ".golden" / "sort_oracle"
    if not exe.exists():
        ksort = REF_DIR / "ksort.h"
        if not ksort.exists():
            pytest.skip("reference ksort.h not available")
        src = exe.with_suffix(".c")
        src.write_text(SORT_ORACLE_SRC.format(ksort=ksort))
        subprocess.run(["gcc", "-O2", "-o", str(exe), str(src)], check=True)
    return exe


def _ref_perm(exe, keys):
    inp = f"{len(keys)}\n" + "\n".join(map(str, keys))
    out = subprocess.run([str(exe)], input=inp, capture_output=True, text=True)
    return np.array(out.stdout.split(), dtype=np.int64)


@pytest.mark.parametrize("n,kmax", [(5, 3), (64, 5), (65, 5), (200, 7),
                                    (1000, 20), (5000, 50), (100000, 1000),
                                    (50000, 4), (1000, 2 ** 63)])
def test_radix_argsort_matches_reference(sort_oracle, n, kmax):
    rng = np.random.default_rng(n * 7 + kmax % 97)
    keys = rng.integers(0, kmax, size=n, dtype=np.uint64)
    ref = _ref_perm(sort_oracle, keys)
    assert np.array_equal(ref, radix_argsort(keys))


def test_python_fallback_matches_native():
    rng = np.random.default_rng(42)
    for n, kmax in [(7, 3), (64, 5), (65, 5), (512, 9), (3000, 17)]:
        keys = rng.integers(0, kmax, size=n, dtype=np.uint64)
        assert np.array_equal(radix_argsort(keys), _py_radix_argsort(keys))
