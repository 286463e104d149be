"""Minimal SQL tokenizer — enough structure for token-aware rewrites.

The reference corrupts queries containing the word FORMAT inside a
string literal (``"FORMAT" in query.upper()``, main.py:534) and
flattens multi-line bodies through string surgery (main.py:884-889).
Tokenizing first avoids that class of bug: string literals, quoted
identifiers and comments are opaque single tokens.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>--[^\n]*|/\*.*?\*/)
  | (?P<string>'(?:[^'\\]|\\.|'')*')
  | (?P<bquote>`(?:[^`]|``)*`)
  | (?P<dquote>"(?:[^"\\]|\\.)*")
  | (?P<number>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><=|>=|!=|<>|==|\|\||->|::|[%()\[\]{},;:.+\-*/<>=?!@#&|~^])
    """,
    re.VERBOSE | re.DOTALL,
)


@dataclass
class Tok:
    kind: str  # ws|comment|string|bquote|dquote|number|ident|op
    text: str

    @property
    def upper(self) -> str:
        return self.text.upper() if self.kind == "ident" else self.text


def tokenize(sql: str) -> list[Tok]:
    toks: list[Tok] = []
    pos = 0
    while pos < len(sql):
        m = TOKEN_RE.match(sql, pos)
        if not m:
            # Unknown byte: keep it as an opaque op token rather than fail.
            toks.append(Tok("op", sql[pos]))
            pos += 1
            continue
        kind = m.lastgroup or "op"
        toks.append(Tok(kind, m.group(0)))
        pos = m.end()
    return toks


def render(toks: list[Tok]) -> str:
    return "".join(t.text for t in toks)


def significant(toks: list[Tok]) -> list[int]:
    """Indices of non-whitespace, non-comment tokens."""
    return [i for i, t in enumerate(toks) if t.kind not in ("ws", "comment")]
