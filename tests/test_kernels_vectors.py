import math

from hypothesis import given, settings

# the sandbox host has spiky CPU steal; wall-clock deadlines flake
settings.register_profile("noisy_host", deadline=None)
settings.load_profile("noisy_host")
from hypothesis import strategies as st

from webcrawler_spark.kernels import SparseVector


def test_basic_ops():
    a = SparseVector({1: 2.0})
    b = SparseVector({1: 2.0, 2: 4.0})
    assert (a + b).d == {1: 4.0, 2: 4.0}
    assert (b - a).d == {2: 4.0}
    assert a.dot(b) == 4.0
    assert b.norm == math.sqrt(4 + 16)
    assert b.sqr == 20.0


def test_accuracy_threshold():
    v = SparseVector({1: 1.0, 2: 0.00005})
    assert v.d == {1: 1.0}
    # subtraction cancels to below-threshold values
    a = SparseVector({1: 2.0})
    assert (a - a).d == {}


def test_normal():
    v = SparseVector({1: 3.0, 2: 4.0})
    n = v.normal
    assert abs(n.norm - 1.0) < 1e-12
    assert n.d[1] == 0.6 and n.d[2] == 0.8
    assert SparseVector({}).normal.d == {}


# build above-threshold magnitudes directly instead of filtering
# floats(-100,100): hypothesis biases toward 0/subnormals, so the filter
# rejects enough examples to trip the filter_too_much health check on
# unlucky seeds
_signed = st.builds(
    lambda m, neg: -m if neg else m, st.floats(0.001, 100.0), st.booleans()
)
vec = st.dictionaries(st.integers(0, 50), _signed, max_size=10).map(SparseVector)


@given(vec, vec)
def test_dot_symmetric(a, b):
    assert abs(a.dot(b) - b.dot(a)) < 1e-9


@given(vec)
def test_normal_unit(v):
    if v:
        assert abs(v.normal.norm - 1.0) < 1e-6
