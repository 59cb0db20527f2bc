"""WarpScript evaluator unit tests: tokenizer lexical rules, stack
machine semantics, control flow, and GTS pipeline binding. The five ws_*
queries in queries/ws.py carry the end-to-end DuckDB parity."""

import pytest

from warp10_platform_spark.warpscript.stack import Macro, WarpScriptStack, exec_script
from warp10_platform_spark.warpscript.tokenizer import tokenize


def run(script, spark=None, sf_dir=""):
    st = WarpScriptStack(spark, sf_dir)
    st.exec(script)
    return st


# ---------- tokenizer ----------

def test_tokenize_literals():
    kinds = [(t.kind, t.value) for t in tokenize("42 -7 3.5 1e3 0xff 0b101 true false 'str' \"d\" NULL")]
    assert kinds == [
        ("number", 42), ("number", -7), ("number", 3.5), ("number", 1000.0),
        ("number", 255), ("number", 5), ("bool", True), ("bool", False),
        ("string", "str"), ("string", "d"), ("null", None),
    ]


def test_tokenize_comments_and_multiline():
    toks = tokenize("1 // comment\n# hash\n/* block\nstill */ 2 <' multi\nline '>")
    assert [t.value for t in toks] == [1, 2, " multi\nline "]


def test_tokenize_escapes_keep_regex():
    (t,) = tokenize(r"'~events\..*'")
    assert t.value == r"~events\..*"
    (t,) = tokenize(r"'quote\'s'")
    assert t.value == "quote's"


def test_tokenize_load_deref():
    toks = tokenize("$x @m FOO")
    assert [(t.kind, t.value) for t in toks] == [("load", "x"), ("deref", "m"), ("stmt", "FOO")]


# ---------- stack machine ----------

def test_arithmetic_and_stack_ops():
    st = run("1 2 + 3 * DUP -")  # ((1+2)*3)=9, DUP, 9-9=0
    assert st.stack == [0]


def test_time_units():
    st = run("1 h 30 m +")
    assert st.stack == [3_600_000_000 + 1_800_000_000]


def test_list_and_map_literals():
    st = run("[ 1 2 3 ] { 'a' 1 'b' 2 }")
    assert st.stack == [[1, 2, 3], {"a": 1, "b": 2}]


def test_store_load_and_dollar():
    st = run("5 'x' STORE $x $x +")
    assert st.stack == [10]


def test_macro_capture_and_run():
    st = run("<% 2 * %> 'double' STORE 21 @double")
    assert st.stack == [42]


def test_nested_macro():
    st = run("<% <% 1 + %> 'inc' STORE 10 @inc %> EVAL")
    assert st.stack == [11]


def test_ift_ifte():
    st = run("1 2 < <% 'yes' %> IFT  3 4 > <% 'then' %> <% 'else' %> IFTE")
    assert st.stack == ["yes", "else"]


def test_foreach_for():
    st = run("0 'acc' STORE [ 1 2 3 ] <% $acc + 'acc' STORE %> FOREACH $acc")
    assert st.stack == [6]
    st = run("0 1 5 <% + %> FOR")  # 0+1+2+3+4+5
    assert st.stack == [15]


def test_ops_limit_guards_runaway():
    st = WarpScriptStack(None, "", max_ops=100)
    with pytest.raises(RuntimeError, match="ops limit"):
        st.exec("1 100000 <% DROP 1 %> FOR")


def test_unknown_function_reports_line():
    with pytest.raises(NameError, match="line 2"):
        run("1\nBOGUS_FN")


def test_macro_is_value():
    st = run("<% 1 %>")
    assert isinstance(st.stack[0], Macro)


# ---------- GTS pipeline binding (lazy — no job until collect) ----------

def test_fetch_builds_lazy_frame(spark, sf_dir):
    from warp10_platform_spark.core.frame import GTSFrame

    st = WarpScriptStack(spark, sf_dir)
    st.exec("[ 'events.purchase' { } 0 2000000000000000 ] FETCH")
    gf = st.peek()
    assert isinstance(gf, GTSFrame)
    assert gf.df.schema is not None  # analyzable plan, nothing executed


def test_exec_script_pipeline(spark, sf_dir):
    out = exec_script(
        spark,
        sf_dir,
        """
        [ '~events\\..*' { } 0 2000000000000000 ] FETCH
        [ SWAP bucketizer.count 1706659200000000 86400000000 31 ] BUCKETIZE
        """,
    )
    row = out.df.limit(1).collect()
    assert len(row) == 1


def test_labels_map_in_fetch(spark, sf_dir):
    st = WarpScriptStack(spark, sf_dir)
    st.exec("[ 'events.purchase' { 'user' '1' } 0 2000000000000000 ] FETCH")
    df = st.peek().df
    users = [r[0] for r in df.select("labels").limit(50).collect()]
    assert users and all(u["user"] == "1" for u in users)
