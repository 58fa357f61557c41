"""Lexer + recursive-descent parser for the VIAMD script language.

Grammar per the reference's language surface (keyword/builtin list at
/root/reference/ext/ImGuiColorTextEdit/TextEditor.cpp:3306-3337, default
script src/main.cpp:528, selection-suggestion writer src/main.cpp:2484-2530):

  script      := statement*
  statement   := (ident | '{' ident (',' ident)* '}') '=' expr ';'?
               | expr ';'?
  expr        := or_expr ('in' or_expr)?
  or_expr     := and_expr ('or' and_expr)*
  and_expr    := not_expr ('and' not_expr)*
  not_expr    := 'not' not_expr | cmp_expr
  cmp_expr    := add_expr (('<'|'>'|'<='|'>='|'=='|'!=') add_expr)?
  add_expr    := mul_expr (('+'|'-') mul_expr)*
  mul_expr    := unary (('*'|'/') unary)*
  unary       := '-' unary | postfix
  postfix     := primary ('[' range_or_int ']' | '(' args ')')*
  primary     := NUMBER | STRING | IDENT | '(' expr ')' | '{' args '}'
  args        := (arg (',' arg)*)?
  arg         := expr (':' expr)?          -- a:b ranges in argument position
  range_or_int:= expr (':' expr)?

Numbers: ints and floats. Ranges use ':' (e.g. resid(2:8), s[2:8]); an
omitted endpoint (s[2:]) means open-ended. Comments: '#' and '//' to EOL.
All source locations are tracked for error reporting with source ranges,
mirroring the editor-marker contract of md_script
(/root/reference/src/main.cpp:868-930).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional


class ScriptError(Exception):
    """Compile/eval error with a source range (line, col_beg, col_end)."""

    def __init__(self, msg: str, line: int = 0, col: int = 0, end_col: int = 0):
        super().__init__(msg)
        self.msg = msg
        self.line = line
        self.col = col
        self.end_col = end_col or col

    def __str__(self):
        if self.line:
            return f"{self.line}:{self.col}: {self.msg}"
        return self.msg


# ---------------------------------------------------------------------------
# tokens
# ---------------------------------------------------------------------------

_PUNCT = (
    "<=", ">=", "==", "!=", "(", ")", "[", "]", "{", "}",
    ",", ";", ":", "=", "+", "-", "*", "/", "<", ">",
)
# `out` completes the reference's VIAMD keyword vocabulary (TextEditor.cpp:
# 3313 "and or not in out"). The reference snapshot only ever *highlights*
# `out` — no parser rule or script in the app uses it — so it is reserved
# here: tokenized as a keyword and rejected with a typed error wherever an
# identifier is expected (see docs/LANGUAGE.md "Keyword parity").
_KEYWORDS = {"and", "or", "not", "in", "out"}


@dataclass
class Token:
    kind: str  # 'int' 'float' 'str' 'ident' 'punct' 'kw' 'eof'
    text: str
    value: Any
    line: int
    col: int


def tokenize(src: str) -> list[Token]:
    toks: list[Token] = []
    line, col = 1, 1
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            col = 1
            i += 1
            continue
        if c in " \t\r":
            i += 1
            col += 1
            continue
        if c == "#" or src.startswith("//", i):
            while i < n and src[i] != "\n":
                i += 1
            continue
        start_col = col
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            isfloat = False
            while j < n and (src[j].isdigit() or src[j] == "."):
                if src[j] == ".":
                    # '1:2' ranges shouldn't eat ':' but '1.5' should eat '.'
                    if j + 1 < n and src[j + 1].isdigit():
                        isfloat = True
                    else:
                        break
                j += 1
            if j < n and src[j] in "eE" and (
                j + 1 < n and (src[j + 1].isdigit() or src[j + 1] in "+-")
            ):
                isfloat = True
                j += 1
                if src[j] in "+-":
                    j += 1
                while j < n and src[j].isdigit():
                    j += 1
            text = src[i:j]
            val = float(text) if isfloat else int(text)
            toks.append(
                Token("float" if isfloat else "int", text, val, line, start_col)
            )
            col += j - i
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            text = src[i:j]
            kind = "kw" if text in _KEYWORDS else "ident"
            toks.append(Token(kind, text, text, line, start_col))
            col += j - i
            i = j
            continue
        if c in "'\"":
            j = i + 1
            while j < n and src[j] != c:
                if src[j] == "\n":
                    raise ScriptError("unterminated string", line, start_col)
                j += 1
            if j >= n:
                raise ScriptError("unterminated string", line, start_col)
            toks.append(Token("str", src[i : j + 1], src[i + 1 : j], line, start_col))
            col += j + 1 - i
            i = j + 1
            continue
        matched = None
        for p in _PUNCT:
            if src.startswith(p, i):
                matched = p
                break
        if matched is None:
            raise ScriptError(f"unexpected character {c!r}", line, start_col)
        toks.append(Token("punct", matched, matched, line, start_col))
        i += len(matched)
        col += len(matched)
    toks.append(Token("eof", "", None, line, col))
    return toks


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class Node:
    line: int = field(default=0, kw_only=True)
    col: int = field(default=0, kw_only=True)


@dataclass
class Num(Node):
    value: float | int


@dataclass
class Str(Node):
    value: str


@dataclass
class Ident(Node):
    name: str


@dataclass
class Call(Node):
    func: str
    args: list


@dataclass
class BinOp(Node):
    op: str
    lhs: Node
    rhs: Node


@dataclass
class UnOp(Node):
    op: str
    operand: Node


@dataclass
class InExpr(Node):
    expr: Node
    context: Node


@dataclass
class RangeLit(Node):
    beg: Optional[Node]  # None = open
    end: Optional[Node]


@dataclass
class Subscript(Node):
    base: Node
    index: Node  # Num or RangeLit


@dataclass
class ArrayLit(Node):
    items: list


@dataclass
class Assign(Node):
    targets: list[str]  # 1 name, or k names for {a,b,c} destructuring
    expr: Node
    source: str = ""  # source text of the statement (for property labels)


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


class _Parser:
    def __init__(self, toks: list[Token], src: str):
        self.toks = toks
        self.pos = 0
        self.src_lines = src.splitlines()

    def peek(self) -> Token:
        return self.toks[self.pos]

    def next(self) -> Token:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, text: str) -> Token:
        t = self.peek()
        if t.text != text:
            raise ScriptError(f"expected {text!r}, found {t.text!r}", t.line, t.col)
        return self.next()

    def at_punct(self, text: str) -> bool:
        t = self.peek()
        return t.kind == "punct" and t.text == text

    # -- statements ----------------------------------------------------------
    def parse_script(self) -> list[Assign]:
        stmts = []
        anon = 0
        while self.peek().kind != "eof":
            while self.at_punct(";"):
                self.next()
            if self.peek().kind == "eof":
                break
            stmts.append(self.parse_statement(anon))
            if stmts[-1].targets and stmts[-1].targets[0].startswith("$"):
                anon += 1
            while self.at_punct(";"):
                self.next()
        return stmts

    def parse_statement(self, anon_idx: int) -> Assign:
        t0 = self.peek()
        targets = None
        save = self.pos
        if t0.kind == "ident" and self.toks[self.pos + 1].text == "=":
            name = self.next().text
            self.next()  # '='
            targets = [name]
        elif t0.kind == "punct" and t0.text == "{":
            # try destructuring {a,b,c} =
            try:
                self.next()
                names = [self.expect_ident()]
                while self.at_punct(","):
                    self.next()
                    names.append(self.expect_ident())
                self.expect("}")
                self.expect("=")
                targets = names
            except ScriptError:
                self.pos = save
                targets = None
        if targets is None:
            targets = [f"$expr{anon_idx}"]
        expr = self.parse_expr()
        return Assign(targets, expr, line=t0.line, col=t0.col)

    def expect_ident(self) -> str:
        t = self.peek()
        if t.kind != "ident":
            raise ScriptError(f"expected identifier, found {t.text!r}", t.line, t.col)
        return self.next().text

    # -- expressions ---------------------------------------------------------
    def parse_expr(self) -> Node:
        e = self.parse_or()
        while self.peek().text == "in" and self.peek().kind == "kw":
            t = self.next()
            ctx = self.parse_or()
            e = InExpr(e, ctx, line=t.line, col=t.col)
        return e

    def parse_or(self) -> Node:
        e = self.parse_and()
        while self.peek().kind == "kw" and self.peek().text == "or":
            t = self.next()
            e = BinOp("or", e, self.parse_and(), line=t.line, col=t.col)
        return e

    def parse_and(self) -> Node:
        e = self.parse_not()
        while self.peek().kind == "kw" and self.peek().text == "and":
            t = self.next()
            e = BinOp("and", e, self.parse_not(), line=t.line, col=t.col)
        return e

    def parse_not(self) -> Node:
        if self.peek().kind == "kw" and self.peek().text == "not":
            t = self.next()
            return UnOp("not", self.parse_not(), line=t.line, col=t.col)
        return self.parse_cmp()

    def parse_cmp(self) -> Node:
        e = self.parse_add()
        if self.peek().kind == "punct" and self.peek().text in (
            "<", ">", "<=", ">=", "==", "!=",
        ):
            t = self.next()
            e = BinOp(t.text, e, self.parse_add(), line=t.line, col=t.col)
        return e

    def parse_add(self) -> Node:
        e = self.parse_mul()
        while self.peek().kind == "punct" and self.peek().text in ("+", "-"):
            t = self.next()
            e = BinOp(t.text, e, self.parse_mul(), line=t.line, col=t.col)
        return e

    def parse_mul(self) -> Node:
        e = self.parse_unary()
        while self.peek().kind == "punct" and self.peek().text in ("*", "/"):
            t = self.next()
            e = BinOp(t.text, e, self.parse_unary(), line=t.line, col=t.col)
        return e

    def parse_unary(self) -> Node:
        if self.at_punct("-"):
            t = self.next()
            return UnOp("-", self.parse_unary(), line=t.line, col=t.col)
        return self.parse_postfix()

    def parse_postfix(self) -> Node:
        e = self.parse_primary()
        while True:
            if self.at_punct("["):
                t = self.next()
                idx = self.parse_arg()
                self.expect("]")
                e = Subscript(e, idx, line=t.line, col=t.col)
            elif self.at_punct("(") and isinstance(e, Ident):
                self.next()
                args = []
                if not self.at_punct(")"):
                    args.append(self.parse_arg())
                    while self.at_punct(","):
                        self.next()
                        args.append(self.parse_arg())
                self.expect(")")
                e = Call(e.name, args, line=e.line, col=e.col)
            else:
                break
        return e

    def parse_arg(self) -> Node:
        """expr or range `a:b` (either endpoint optional)."""
        t0 = self.peek()
        if self.at_punct(":"):
            self.next()
            if self._range_end():
                return RangeLit(None, None, line=t0.line, col=t0.col)
            return RangeLit(None, self.parse_expr(), line=t0.line, col=t0.col)
        e = self.parse_expr()
        if self.at_punct(":"):
            self.next()
            if self._range_end():
                return RangeLit(e, None, line=t0.line, col=t0.col)
            return RangeLit(e, self.parse_expr(), line=t0.line, col=t0.col)
        return e

    def _range_end(self) -> bool:
        t = self.peek()
        return t.kind == "punct" and t.text in (")", "]", ",", "}")

    def parse_primary(self) -> Node:
        t = self.peek()
        if t.kind in ("int", "float"):
            self.next()
            return Num(t.value, line=t.line, col=t.col)
        if t.kind == "str":
            self.next()
            return Str(t.value, line=t.line, col=t.col)
        if t.kind == "ident":
            self.next()
            return Ident(t.value, line=t.line, col=t.col)
        if self.at_punct("("):
            self.next()
            e = self.parse_expr()
            self.expect(")")
            return e
        if self.at_punct("{"):
            self.next()
            items = []
            if not self.at_punct("}"):
                items.append(self.parse_arg())
                while self.at_punct(","):
                    self.next()
                    items.append(self.parse_arg())
            self.expect("}")
            return ArrayLit(items, line=t.line, col=t.col)
        raise ScriptError(f"unexpected token {t.text!r}", t.line, t.col)


def parse(src: str) -> list[Assign]:
    """Parse script text → list of assignment statements."""
    return _Parser(tokenize(src), src).parse_script()
