"""Single-pass WarpScript tokenizer (MemoryWarpScriptStack.java:642-960).

Mirrors the reference's lexical rules: `//`/`#` line comments, `/* */`
block comments, single-/double-quoted strings (%xx URL-escapes
decoded, like the reference's URLDecoder pass), `<' '>` multiline strings, long/double/
hex/binary numeric literals, booleans, `$var` load shorthand, `@macro`
deref shorthand, and `<% %>` macro capture handled by the stack (the
tokenizer just emits the markers). Everything else is a statement token.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Token:
    kind: str  # 'number' | 'string' | 'bool' | 'null' | 'load' | 'deref' | 'stmt'
    value: object
    lineno: int


def tokenize(script: str) -> list[Token]:
    tokens: list[Token] = []
    i, n = 0, len(script)
    lineno = 1
    while i < n:
        c = script[i]
        if c == "\n":
            lineno += 1
            i += 1
            continue
        if c in " \t\r":
            i += 1
            continue
        # comments
        if script.startswith("//", i) or c == "#":
            while i < n and script[i] != "\n":
                i += 1
            continue
        if script.startswith("/*", i):
            end = script.find("*/", i + 2)
            if end < 0:
                raise SyntaxError(f"line {lineno}: unterminated block comment")
            lineno += script.count("\n", i, end)
            i = end + 2
            continue
        # multiline string <' ... '>
        if script.startswith("<'", i):
            end = script.find("'>", i + 2)
            if end < 0:
                raise SyntaxError(f"line {lineno}: unterminated multiline string")
            body = script[i + 2 : end]
            tokens.append(Token("string", body.strip("\n"), lineno))
            lineno += script.count("\n", i, end)
            i = end + 2
            continue
        # strings
        if c in "'\"":
            j = i + 1
            buf = []
            while j < n and script[j] != c:
                if script[j] == "\n":
                    raise SyntaxError(f"line {lineno}: newline in string")
                if script[j] == "\\" and j + 1 < n:
                    nxt = script[j + 1]
                    # only quote/backslash escapes collapse; \. etc. stay
                    # verbatim so regex selectors survive tokenization
                    buf.append(nxt if nxt in ("\\", "'", '"') else "\\" + nxt)
                    j += 2
                    continue
                buf.append(script[j])
                j += 1
            if j >= n:
                raise SyntaxError(f"line {lineno}: unterminated string")
            # Reference string literals are URL-encoded (exec URL-decodes
            # them — that's how SNAPSHOT escapes quotes as %27). Python's
            # unquote is lenient: invalid %-sequences pass through, so
            # regex selectors with bare % survive.
            from urllib.parse import unquote

            tokens.append(Token("string", unquote("".join(buf)), lineno))
            i = j + 1
            continue
        # token word: up to whitespace
        j = i
        while j < n and script[j] not in " \t\r\n":
            j += 1
        word = script[i:j]
        i = j
        tokens.append(_classify(word, lineno))
    return tokens


def incomplete(script: str) -> tuple[bool, int, bool]:
    """REPL line-buffering support (EgressInteractiveHandler.java — the
    reference REPL keeps MemoryWarpScriptStack parser state across lines
    and its prompt reports isInMultiline/macroDepth): decide whether a
    buffered fragment is lexically complete enough to exec.

    Returns ``(is_incomplete, macro_depth, in_multiline)`` where
    incomplete means an open ``<% %>`` macro capture, an unterminated
    ``<' '>`` multiline string, or an open ``/* */`` block comment.
    Hard lexical errors (newline inside a single-line string) re-raise —
    those can never be completed by more input."""
    try:
        toks = tokenize(script)
    except SyntaxError as e:
        msg = str(e)
        if "unterminated multiline string" in msg or "unterminated block comment" in msg:
            return True, 0, "multiline string" in msg
        raise
    depth = 0
    for t in toks:
        if t.kind == "stmt":
            if t.value == "<%":
                depth += 1
            elif t.value == "%>" and depth > 0:
                depth -= 1
    return depth > 0, depth, False


def _classify(word: str, lineno: int) -> Token:
    if word in ("true", "T", "TRUE"):
        return Token("bool", True, lineno)
    if word in ("false", "F", "FALSE"):
        return Token("bool", False, lineno)
    if word == "NULL":
        return Token("null", None, lineno)
    if word.startswith("$") and len(word) > 1:
        return Token("load", word[1:], lineno)
    if word.startswith("@") and len(word) > 1:
        return Token("deref", word[1:], lineno)
    # numeric literals: long, double, hex (0x), binary (0b), exponent forms
    try:
        if word.startswith(("0x", "0X")):
            return Token("number", int(word, 16), lineno)
        if word.startswith(("0b", "0B")):
            return Token("number", int(word, 2), lineno)
        if any(ch in word for ch in ".eE") and not word.lstrip("+-")[:1].isalpha():
            return Token("number", float(word), lineno)
        return Token("number", int(word), lineno)
    except ValueError:
        return Token("stmt", word, lineno)
