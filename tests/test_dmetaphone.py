"""Golden parity for Double Metaphone + the phonetic/PyStemmer analyzers
against the reference's lang/dmetaphone.py + DoubleMetaphoneFilter token
streams (test_analysis.py:266-330)."""

import random
import string

import pytest

from tests.conftest import reference_importable
from whoosh_reloaded_spark.analyzers import (
    DoubleMetaphoneAnalyzer,
    PyStemmerAnalyzer,
    SimpleAnalyzer,
)
from whoosh_reloaded_spark.dmetaphone import double_metaphone

NAMES = {
    "maurice": ("MRS", None), "aubrey": ("APR", None),
    "cambrillo": ("KMPRL", "KMPR"), "heidi": ("HT", None),
    "katherine": ("K0RN", "KTRN"), "Thumbail": ("0MPL", "TMPL"),
    "catherine": ("K0RN", "KTRN"), "richard": ("RXRT", "RKRT"),
    "bob": ("PP", None), "eric": ("ARK", None), "geoff": ("JF", "KF"),
    "Through": ("0R", "TR"), "Schwein": ("XN", "XFN"), "dave": ("TF", None),
    "ray": ("R", None), "steven": ("STFN", None), "bryce": ("PRS", None),
    "randy": ("RNT", None), "bryan": ("PRN", None), "Rapelje": ("RPL", None),
    "brian": ("PRN", None), "otto": ("AT", None), "auto": ("AT", None),
    "Dallas": ("TLS", None), "maisey": ("MS", None), "zhang": ("JNK", None),
    "Chile": ("XL", None), "Jose": ("HS", None), "Arnow": ("ARN", "ARNF"),
    "solilijs": ("SLLS", None), "Parachute": ("PRKT", None),
    "Nowhere": ("NR", None), "Tux": ("TKS", None),
}


def test_reference_name_table():
    for name, want in NAMES.items():
        assert double_metaphone(name) == want, name


def test_filter_token_stream():
    # the reference's 'Spruce View' stream shapes (test_analysis.py:309-330)
    mf = DoubleMetaphoneAnalyzer(SimpleAnalyzer())
    assert [(t, b) for t, _, b in mf("Spruce View")] == [
        ("SPRS", 1.0), ("F", 1.0), ("FF", 0.5)
    ]
    mf = DoubleMetaphoneAnalyzer(SimpleAnalyzer(), combine=True)
    assert [(t, b) for t, _, b in mf("Spruce View")] == [
        ("spruce", 1.0), ("SPRS", 1.0),
        ("view", 1.0), ("F", 1.0), ("FF", 0.5),
    ]


@pytest.mark.skipif(not reference_importable(), reason="reference missing")
def test_fuzz_vs_reference():
    from whoosh.lang.dmetaphone import double_metaphone as ref

    rng = random.Random(7)
    alpha = string.ascii_lowercase + "  ç ñ"
    for _ in range(30000):
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        assert double_metaphone(w) == ref(w), repr(w)


def test_pystemmer_analyzer():
    a = PyStemmerAnalyzer("english")
    # the py-stemmer library's "english" algorithm is snowball (porter2):
    # running -> run; its "porter" algorithm is the classic porter, whose
    # own quirk yields "runn"
    assert a.query_terms("running jumps") == ["run", "jump"]
    assert PyStemmerAnalyzer("porter").query_terms("running jumps") == [
        "runn", "jump",
    ]
    sp = PyStemmerAnalyzer("spanish")
    assert sp.query_terms("corriendo") != ["corriendo"]  # stemmed
    ig = PyStemmerAnalyzer("english", ignore=["running"])
    assert ig.query_terms("running jumps") == ["running", "jump"]
    assert "english" in PyStemmerAnalyzer.algorithms()
    with pytest.raises(ValueError):
        PyStemmerAnalyzer("klingon")
