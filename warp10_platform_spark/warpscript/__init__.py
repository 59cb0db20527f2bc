"""WarpScript-subset evaluator — the reference's main entry point
(POST /api/v0/exec, SURVEY §3.1) re-expressed over the Spark engine.

Faithful to the reference's execution model (MemoryWarpScriptStack.java:586
`exec`): there is NO AST — a single-pass tokenizer feeds a value stack, and
every non-literal token is a function applied immediately. Here the stack
lives in the Python driver, GTS-list stack values are *lazy DataFrames*,
and GTS functions (FETCH/BUCKETIZE/MAP/REDUCE/…) append DataFrame
transformations, so Catalyst still owns planning: a whole script compiles
into one logical plan, executed only when the caller collects.
"""

from warp10_platform_spark.warpscript.stack import WarpScriptStack, exec_script

__all__ = ["WarpScriptStack", "exec_script"]
