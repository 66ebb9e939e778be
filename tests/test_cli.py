"""CLI behavior tests (playTests.sh / cli-tests analog)."""

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.conftest import gen_text

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, data=b"", check=True):
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", PYTHONPATH=REPO)
    return subprocess.run([sys.executable, "-m", "zstd_tpu.cli",
                           "--engine", "host", *args],
                          input=data, capture_output=True, env=env,
                          check=check)


def test_version():
    r = run_cli(["-V"])
    assert b"zstd_tpu" in r.stdout


def test_pipe_roundtrip():
    data = gen_text(50000)
    c = run_cli(["-c", "-1"], data).stdout
    d = run_cli(["-dc"], c).stdout
    assert d == data


def test_file_roundtrip(tmp_path):
    data = gen_text(30000, seed=2)
    f = tmp_path / "input.txt"
    f.write_bytes(data)
    run_cli(["-q", str(f)])
    assert (tmp_path / "input.txt.zst").exists()
    run_cli(["-d", "-f", "-o", str(tmp_path / "restored"),
             str(tmp_path / "input.txt.zst")])
    assert (tmp_path / "restored").read_bytes() == data


def test_no_overwrite_without_force(tmp_path):
    data = gen_text(1000, seed=3)
    f = tmp_path / "x"
    f.write_bytes(data)
    (tmp_path / "x.zst").write_bytes(b"existing")
    r = run_cli([str(f)], check=False)
    assert r.returncode != 0
    assert (tmp_path / "x.zst").read_bytes() == b"existing"


def test_test_mode(tmp_path):
    data = gen_text(20000, seed=4)
    c = run_cli(["-c", "-3"], data).stdout
    f = tmp_path / "a.zst"
    f.write_bytes(c)
    r = run_cli(["-t", str(f)])
    assert r.returncode == 0
    # corrupted file must fail (XOR so the bytes are GUARANTEED to change;
    # a fixed overwrite pattern can coincide with the original bytes)
    f.write_bytes(c[:50] + bytes(b ^ 0xFF for b in c[50:54]) + c[54:])
    r = run_cli(["-t", str(f)], check=False)
    assert r.returncode != 0


def test_list(tmp_path):
    data = gen_text(40000, seed=5)
    c = run_cli(["-c", "--check"], data).stdout
    f = tmp_path / "a.zst"
    f.write_bytes(c)
    r = run_cli(["-l", str(f)])
    out = r.stdout.decode()
    assert "XXH64" in out
    assert "40000" in out


def test_train_and_use(tmp_path):
    from tests.test_dictionary import make_samples
    samples = make_samples(40, seed=11)
    sdir = tmp_path / "s"
    sdir.mkdir()
    for i, s in enumerate(samples):
        (sdir / f"f{i}").write_bytes(s)
    dict_file = tmp_path / "dict"
    run_cli(["--train", *[str(p) for p in sdir.iterdir()],
             "-o", str(dict_file), "--maxdict", "2048"])
    assert dict_file.exists()
    data = samples[0]
    c = run_cli(["-c", "-D", str(dict_file)], data).stdout
    d = run_cli(["-dc", "-D", str(dict_file)], c).stdout
    assert d == data


def test_decompress_reference_output_via_cli(ref):
    from tests.conftest import ref_compress
    data = gen_text(60000, seed=6)
    blob = ref_compress(data, "-19")
    d = run_cli(["-dc"], blob).stdout
    assert d == data


def test_cli_threads_trace_recursive(tmp_path, ref):
    """-T# parallel frames, --trace CSV, -r recursion, mtime mirroring."""
    from tests.conftest import ref_decompress
    d = tmp_path / "tree" / "sub"
    d.mkdir(parents=True)
    f1 = tmp_path / "tree" / "a.bin"
    f2 = d / "b.bin"
    f1.write_bytes(gen_text(120_000, seed=1))
    f2.write_bytes(gen_text(80_000, seed=2))
    os.utime(f1, (1000000000, 1000000000))
    trace = tmp_path / "t.csv"
    run_cli(["-3", "-T2", "-r", "--trace", str(trace),
             str(tmp_path / "tree")])
    for f in (f1, f2):
        z = f.parent / (f.name + ".zst")
        assert z.exists()
        assert ref_decompress(z.read_bytes()) == f.read_bytes()
    assert int((f1.parent / "a.bin.zst").stat().st_mtime) == 1000000000
    rows = trace.read_text().strip().splitlines()
    assert rows[0].startswith("Algorithm") and len(rows) >= 3


def test_cli_filelist_and_superblock(tmp_path, ref):
    from tests.conftest import ref_decompress
    f = tmp_path / "x.bin"
    f.write_bytes(gen_text(150_000, seed=3))
    lst = tmp_path / "files.txt"
    lst.write_text(str(f) + "\n")
    run_cli(["-5", "--filelist", str(lst),
             "--target-compressed-block-size", "2048"])
    z = tmp_path / "x.bin.zst"
    assert ref_decompress(z.read_bytes()) == f.read_bytes()


def test_adapt_decide_reference_semantics():
    """_adapt_decide mirrors FIO_compressZstdFrame's corrections
    (fileio.c:1590-1666): output backpressure / starved input raise the
    level, queued-up input with healthy output lowers it."""
    from zstd_tpu.fileio_async import _adapt_decide
    # output can't flush -> slower (higher level)
    assert _adapt_decide(False, True, True, 5, 1, 19) == 6
    # input slower than compression -> slower (higher level)
    assert _adapt_decide(True, False, False, 5, 1, 19) == 6
    # input waiting on us, output healthy -> faster (lower level)
    assert _adapt_decide(False, True, False, 5, 1, 19) == 4
    # steady state -> no change; bounds respected
    assert _adapt_decide(False, False, False, 5, 1, 19) == 5
    assert _adapt_decide(False, True, True, 19, 1, 19) == 19
    assert _adapt_decide(False, True, False, 1, 1, 19) == 1


def test_cli_adapt_file_queue_feedback(tmp_path, ref):
    """--adapt on a large file drives the queue-feedback path and yields
    multi-frame output any decoder reads."""
    from tests.conftest import ref_decompress
    f = tmp_path / "big.bin"
    f.write_bytes(gen_text(9 * 1024 * 1024, seed=8))
    run_cli(["--adapt", "min=1,max=6", str(f)])
    z = tmp_path / "big.bin.zst"
    assert z.exists()
    assert ref_decompress(z.read_bytes()) == f.read_bytes()


def test_cli_multiformat_passthrough(tmp_path):
    """--format gzip/xz compress + magic-sniffed decompress
    (FIO_decompressFrames multi-format sniff, fileio.c:2721)."""
    import gzip
    import lzma

    data = gen_text(120_000, seed=13)
    src = tmp_path / "m.bin"
    src.write_bytes(data)
    # compress to gzip, decompress by sniff
    run_cli(["--format", "gzip", "-6", str(src)])
    gz = tmp_path / "m.bin.gz"
    assert gz.exists() and gzip.decompress(gz.read_bytes()) == data
    r = run_cli(["-d", "-c", str(gz)])
    assert r.stdout == data
    # xz round trip through the CLI both ways
    run_cli(["--format", "xz", "-f", "-o", str(tmp_path / "m.xz"), str(src)])
    assert lzma.decompress((tmp_path / "m.xz").read_bytes()) == data
    r = run_cli(["-d", "-c", str(tmp_path / "m.xz")])
    assert r.stdout == data
    # foreign-made gzip decodes too
    (tmp_path / "ext.gz").write_bytes(gzip.compress(data))
    r = run_cli(["-d", "-c", str(tmp_path / "ext.gz")])
    assert r.stdout == data


def test_cli_output_dir_flat(tmp_path):
    """--output-dir-flat collects outputs by basename (zstdcli analog)."""
    from tests.conftest import ref_decompress
    sub = tmp_path / "a" / "b"
    sub.mkdir(parents=True)
    data = gen_text(50_000, seed=21)
    (sub / "x.bin").write_bytes(data)
    outd = tmp_path / "flat"
    run_cli(["-q", "--output-dir-flat", str(outd), str(sub / "x.bin")])
    z = outd / "x.bin.zst"
    assert z.exists()
    assert ref_decompress(z.read_bytes()) == data
    # decompression honors it too
    outd2 = tmp_path / "flat2"
    run_cli(["-d", "-q", "--output-dir-flat", str(outd2), str(z)])
    assert (outd2 / "x.bin").read_bytes() == data


def test_cli_output_dir_mirror(tmp_path, monkeypatch):
    """--output-dir-mirror recreates the source tree under DIR."""
    from tests.conftest import ref_decompress
    monkeypatch.chdir(tmp_path)
    (tmp_path / "src" / "deep").mkdir(parents=True)
    data = gen_text(30_000, seed=22)
    (tmp_path / "src" / "deep" / "y.bin").write_bytes(data)
    run_cli(["-q", "--output-dir-mirror", "m", "-r", "src"])
    z = tmp_path / "m" / "src" / "deep" / "y.bin.zst"
    assert z.exists()
    assert ref_decompress(z.read_bytes()) == data


def test_cli_exclude_compressed(tmp_path):
    """--exclude-compressed skips already-compressed files on -r sweeps."""
    d = tmp_path / "mix"
    d.mkdir()
    data = gen_text(40_000, seed=23)
    (d / "plain.txt").write_bytes(data)
    (d / "already.zst").write_bytes(b"\x28\xb5\x2f\xfd fake")
    run_cli(["-q", "-f", "--exclude-compressed", "-r", str(d)])
    assert (d / "plain.txt.zst").exists()
    assert not (d / "already.zst.zst").exists()


def test_cli_bench_level_range(tmp_path):
    """-b# -e# sweeps the level range; -i# shrinks the timing window."""
    f = tmp_path / "b.bin"
    f.write_bytes(gen_text(60_000, seed=24))
    r = run_cli(["-b1", "-e2", "-i0.05", str(f)])
    lines = [ln for ln in r.stdout.decode().splitlines() if "b.bin" in ln]
    assert len(lines) == 2 and lines[0].startswith(" 1#") \
        and lines[1].startswith(" 2#")


def test_cli_small_flag_parity(tmp_path):
    """The small reference flags: --single-thread, --no-dictID,
    --stream-size (mismatch errors), -M, -B/-S bench, --train-fastcover."""
    data = gen_text(50_000, seed=31)
    src = tmp_path / "x.bin"
    src.write_bytes(data)

    # --single-thread compress + -M decompress limits
    r = run_cli(["-q", "-f", "--single-thread", "-3", str(src)])
    blob = (tmp_path / "x.bin.zst").read_bytes()
    out = run_cli(["-d", "-M", "1024", "-c"], data=blob).stdout
    assert out == data

    # --stream-size: exact passes, mismatch errors
    ok = run_cli(["--stream-size", str(len(data)), "-c", "-"], data=data)
    assert ok.stdout[:4] == b"\x28\xb5\x2f\xfd"
    bad = run_cli(["--stream-size", "7", "-c", "-"], data=data, check=False)
    assert bad.returncode != 0

    # --train-fastcover + --no-dictID: header carries dictID 0
    r = run_cli(["-q", "--train-fastcover", str(src), "-o",
                 str(tmp_path / "dict")])
    dct = str(tmp_path / "dict")
    withid = run_cli(["-3", "-D", dct, "-c", str(src)]).stdout
    noid = run_cli(["-3", "-D", dct, "--no-dictID", "-c", str(src)]).stdout
    from zstd_tpu.format.frame import parse_frame_header
    assert parse_frame_header(withid).dict_id != 0
    assert parse_frame_header(noid).dict_id == 0
    rt = run_cli(["-d", "-D", dct, "-c"], data=noid).stdout
    assert rt == data

    # bench: -B chunks + consolidated vs -S per-file rows
    two = tmp_path / "y.bin"
    two.write_bytes(gen_text(30_000, seed=32))
    cons = run_cli(["-b1", "-i0.05", str(src), str(two)]).stdout
    assert b"2 files" in cons
    sep = run_cli(["-b1", "-i0.05", "-S", "-B", "16384",
                   str(src), str(two)]).stdout
    assert b"x.bin" in sep and b"y.bin" in sep
