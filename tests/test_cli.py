"""CLI entry point (python -m warp10_platform_spark): the /exec surface."""

import json

from warp10_platform_spark.__main__ import main


def test_cli_scalars(spark, capsys, tmp_path):
    p = tmp_path / "s.mc2"
    p.write_text("1 2 + 'x' SWAP")
    assert main([str(p), "--sf-dir", "/root/testdata/sf0.001"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out == [3, "x"]


def test_cli_fetch_bucketize_gts_json(spark, capsys, tmp_path):
    p = tmp_path / "s.mc2"
    p.write_text(
        "[ '~events\\..*' {} 1704844800000000 1704931200000000 ] FETCH "
        "[ SWAP bucketizer.count 1704931200000000 86400000000 1 ] BUCKETIZE"
    )
    assert main([str(p), "--sf-dir", "/root/testdata/sf0.001", "--limit", "5"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert len(out) == 1 and isinstance(out[0], list) and out[0]
    gts = out[0][0]
    assert set(gts) == {"c", "l", "a", "v"}
    assert gts["c"].startswith("events.")
    assert all(len(pt) == 2 for pt in gts["v"])


def test_cli_explain_mode(spark, capsys, tmp_path):
    p = tmp_path / "s.mc2"
    p.write_text("[ 'events.purchase{}' {} 0 1704931200000000 ] FETCH")
    assert main([str(p), "--sf-dir", "/root/testdata/sf0.001", "--explain"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert "gts_plan" in out[0] and "Scan parquet" in out[0]["gts_plan"] or "FileScan" in out[0]["gts_plan"]


def test_cli_error_contract(spark, capsys, tmp_path):
    p = tmp_path / "bad.mc2"
    p.write_text("1 NOSUCHFUNCTION")
    assert main([str(p), "--sf-dir", "/root/testdata/sf0.001"]) == 1
    err = json.loads(capsys.readouterr().err)
    assert "error" in err and "NOSUCHFUNCTION" in err["error"]


def test_cli_example_scripts(spark, capsys):
    """The committed example scripts run end-to-end through the CLI."""
    import glob
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scripts = sorted(glob.glob(os.path.join(repo, "examples", "*.mc2")))
    assert len(scripts) >= 3
    for s in scripts:
        assert main([s, "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"]) == 0, s
        out = json.loads(capsys.readouterr().out)
        assert isinstance(out, list) and out, s


def test_cli_interactive_repl(spark, capsys, monkeypatch):
    """--interactive: lines exec on ONE persistent stack, an error mid-
    session reports and the session continues, EOF prints the final
    stack as the /exec JSON payload."""
    import io

    monkeypatch.setattr("sys.stdin", io.StringIO("1 2 +\nNOSUCHFN\n'x' STORE\n$x 10 *\n"))
    assert main(["--interactive", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    cap = capsys.readouterr()
    assert "NOSUCHFN" in cap.err  # error reported, session survived
    out = json.loads(cap.out.splitlines()[-1])
    assert out == [30]  # 3 stored as x despite the failing line, then 3*10


def test_cli_interactive_multiline(spark, capsys, monkeypatch):
    """Multi-line constructs buffer until complete (the reference REPL
    keeps MemoryWarpScriptStack parser state across lines): a <% %>
    macro and a <' '> multiline string each spanning lines exec as one
    fragment, not per-line."""
    import io

    monkeypatch.setattr("sys.stdin", io.StringIO(
        "<%\n  2 *\n%>\n'dbl' STORE\n21 @dbl\n<'\nhello\nworld\n'>\n"
    ))
    assert main(["--interactive", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    cap = capsys.readouterr()
    out = json.loads(cap.out.splitlines()[-1])
    assert out == ["hello\nworld", 42]


def test_cli_interactive_with_script(spark, capsys, monkeypatch, tmp_path):
    """-i plus a script argument execs the script first, then the REPL
    opens on the resulting stack (the r6 advice: don't silently ignore
    the script)."""
    import io

    p = tmp_path / "seed.mc2"
    p.write_text("<% 3 + %> 'add3' STORE")
    monkeypatch.setattr("sys.stdin", io.StringIO("4 @add3\n"))
    assert main(["--interactive", str(p), "--sf-dir", "/root/testdata/sf0.001"]) == 0
    out = json.loads(capsys.readouterr().out.splitlines()[-1])
    assert out == [7]
