"""Dictionary training + dict compression tests (ZDICT / usingDict analogs),
including cross-implementation checks with the reference binary."""

import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zstd_tpu.dict_builder.fastcover import train_from_samples
from zstd_tpu.dict_builder.zdict import finalize_dictionary
from zstd_tpu.dictionary import (compress_with_dict, decompress_with_dict,
                                 load_dictionary)
from tests.conftest import REF_ZSTD, gen_text


def make_samples(n=80, seed=0):
    rng = np.random.default_rng(seed)
    base = gen_text(400, seed=seed)
    samples = []
    for i in range(n):
        head = b'{"user":"u%04d","type":"record","payload":"' % i
        body = bytes(base[: int(rng.integers(100, 380))])
        samples.append(head + body + b'"}')
    return samples


@pytest.fixture(scope="module")
def trained():
    samples = make_samples()
    content = train_from_samples(samples, max_dict_size=4096, k=256)
    blob = finalize_dictionary(content, samples, dict_id=99999)
    return samples, blob


def test_dictionary_parses(trained):
    samples, blob = trained
    d = load_dictionary(blob)
    assert d.dict_id == 99999
    assert len(d.content) >= 8
    assert d.huf_ctable is not None
    assert d.ll_full and d.ml_full
    assert d.of_cov_max == 28


def test_dict_roundtrip(trained):
    samples, blob = trained
    d = load_dictionary(blob)
    for s in samples[:10]:
        c = compress_with_dict(s, d, level=3, checksum=True)
        assert decompress_with_dict(c, d) == s


def test_dict_improves_ratio(trained):
    samples, blob = trained
    d = load_dictionary(blob)
    import zstd_tpu
    with_d = sum(len(compress_with_dict(s, d, level=3)) for s in samples[:20])
    without = sum(len(zstd_tpu.compress(s, level=3)) for s in samples[:20])
    assert with_d < without


def test_raw_content_dictionary():
    samples = make_samples(seed=3)
    d = load_dictionary(b"raw dictionary content shared prefix " * 20)
    s = samples[0]
    c = compress_with_dict(s, d, level=3)
    assert decompress_with_dict(c, d) == s


def test_reference_decodes_our_dict_frames(ref, trained, tmp_path):
    samples, blob = trained
    d = load_dictionary(blob)
    dict_file = tmp_path / "dict"
    dict_file.write_bytes(blob)
    for s in samples[:5]:
        c = compress_with_dict(s, d, level=3, checksum=True)
        r = subprocess.run([REF_ZSTD, "-dc", "-D", str(dict_file)],
                           input=c, capture_output=True, check=True)
        assert r.stdout == s


def test_we_decode_reference_dict_frames(ref, trained, tmp_path):
    samples, blob = trained
    d = load_dictionary(blob)
    dict_file = tmp_path / "dict"
    dict_file.write_bytes(blob)
    for s in samples[:5]:
        r = subprocess.run([REF_ZSTD, "-c", "-3", "-D", str(dict_file)],
                           input=s, capture_output=True, check=True)
        assert decompress_with_dict(r.stdout, d) == s


def test_reference_dictionary_loads(ref, tmp_path):
    """Train with the REFERENCE --train, then use the dict on both sides."""
    samples = make_samples(seed=7)
    sdir = tmp_path / "samples"
    sdir.mkdir()
    for i, s in enumerate(samples):
        (sdir / f"s{i}").write_bytes(s)
    dict_file = tmp_path / "refdict"
    subprocess.run([REF_ZSTD, "--train", *map(str, sdir.iterdir()),
                    "-o", str(dict_file), "--maxdict=4096"],
                   capture_output=True, check=True)
    d = load_dictionary(dict_file.read_bytes())
    s = samples[0]
    c = compress_with_dict(s, d, level=3, checksum=True)
    assert decompress_with_dict(c, d) == s
    r = subprocess.run([REF_ZSTD, "-dc", "-D", str(dict_file)],
                       input=c, capture_output=True, check=True)
    assert r.stdout == s
    # and decode reference frames made with the same dict
    r = subprocess.run([REF_ZSTD, "-c", "-5", "-D", str(dict_file)],
                       input=s, capture_output=True, check=True)
    assert decompress_with_dict(r.stdout, d) == s


def test_trained_dict_quality_vs_reference_trainer(ref, tmp_path):
    """Our trainers' dictionaries must compress the sample class about as
    well as a reference-trained dictionary (quality gate for the COVER/
    fastCover implementations, not just format interop)."""
    import subprocess
    rng = np.random.default_rng(17)
    tmpl = [gen_text(700, seed=s) for s in range(6)]
    samples = []
    for i in range(120):
        t = tmpl[int(rng.integers(len(tmpl)))]
        cut = int(rng.integers(100, len(t)))
        samples.append(t[:cut] + gen_text(60, seed=1000 + i))
    # reference-trained dictionary
    sdir = tmp_path / "samples"
    sdir.mkdir()
    for i, s in enumerate(samples):
        (sdir / f"s{i}").write_bytes(s)
    refdict = tmp_path / "ref.dict"
    subprocess.run([REF_ZSTD, "--train", *map(str, sdir.iterdir()),
                    "-o", str(refdict), "--maxdict=4096"],
                   check=True, capture_output=True)
    # our trainer with the k/d sweep (the reference's default --train is
    # also an optimizing sweep, ZDICT_optimizeTrainFromBuffer_fastCover)
    from zstd_tpu.dict_builder.cover import optimize_train
    from zstd_tpu.dict_builder.zdict import finalize_dictionary
    raw, _params = optimize_train(samples, max_dict_size=4096, cover=False)
    ours = finalize_dictionary(raw, samples, dict_id=0, level=3)

    def total_with(dict_bytes):
        from zstd_tpu.dictionary import compress_with_dict, load_dictionary
        d = load_dictionary(dict_bytes)
        return sum(len(compress_with_dict(s, d, level=3)) for s in samples)

    ours_total = total_with(ours)
    ref_total = total_with(refdict.read_bytes())
    assert ours_total <= ref_total * 1.10, (ours_total, ref_total)


def test_fast_levels_match_into_dict_prefix():
    """Levels 1-2 must find matches inside the dictionary content
    (ZSTD_fillHashTable / fast dictMatchState role): with a raw-content
    dictionary equal to the input, level 1 collapses to a handful of
    long dict matches instead of compressing from scratch."""
    from conftest import gen_text
    from zstd_tpu.dictionary import (load_dictionary, compress_with_dict,
                                     decompress_with_dict)
    import zstd_tpu
    data = gen_text(100_000, seed=3)
    d = load_dictionary(data)
    blob = compress_with_dict(data, d, level=1)
    assert decompress_with_dict(blob, d) == data
    assert len(blob) < 2_000          # was ~18.5 KB without the prefix fill
    plain = len(zstd_tpu.compress(data, level=1))
    assert len(blob) < plain // 4


def test_train_on_noise_yields_usable_dictionary():
    """Pathological (incompressible) samples once made finalize_dictionary
    raise 'cannot serialize huffman tree'; the reference replaces the flat
    literal distribution with a fake compressible one (ZDICT_flatLit,
    zdict.c:649) — the trained dictionary must serialize, roundtrip, and
    cross-decode with the reference binary."""
    import numpy as np
    from zstd_tpu.dict_builder.fastcover import train_from_samples
    from zstd_tpu.dict_builder.zdict import finalize_dictionary
    from zstd_tpu.dictionary import (load_dictionary, compress_with_dict,
                                     decompress_with_dict)
    rng = np.random.default_rng(79)
    samples = [rng.integers(0, 256, 4000, dtype=np.uint8).tobytes()
               for _ in range(24)]
    raw = train_from_samples(samples, max_dict_size=4096)
    dbytes = finalize_dictionary(raw, samples, dict_id=1234, level=3)
    d = load_dictionary(dbytes)
    data = samples[0] + samples[1]
    blob = compress_with_dict(data, d, level=3)
    assert decompress_with_dict(blob, d) == data
