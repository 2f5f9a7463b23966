"""Cypher tokenizer.

Produces a flat token stream with source positions. Keywords are *soft*:
every word tokenizes as NAME and the parser matches keywords
case-insensitively in context, so `count`, `size`, `contains` etc. remain
usable as identifiers/function names (openCypher behavior).
"""

from __future__ import annotations

from dataclasses import dataclass


class CypherSyntaxError(ValueError):
    def __init__(self, message: str, text: str = "", pos: int = 0):
        line = text.count("\n", 0, pos) + 1
        col = pos - (text.rfind("\n", 0, pos) + 1) + 1
        super().__init__(f"{message} (line {line}, col {col})")
        self.pos = pos


@dataclass(frozen=True)
class Token:
    kind: str  # NAME INT FLOAT STRING PARAM SYM EOF
    value: str
    pos: int

    @property
    def upper(self) -> str:
        return self.value.upper()


# multi-char symbols, longest first
_SYMBOLS = [
    "<=", ">=", "<>", "=~", "->", "<-", "..", "+=",
    "(", ")", "[", "]", "{", "}", ",", ":", ";", ".", "|",
    "=", "<", ">", "+", "-", "*", "/", "%", "^", "$",
]


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in " \t\r\n":
            i += 1
            continue
        if c == "/" and text.startswith("//", i):
            j = text.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        if c == "/" and text.startswith("/*", i):
            j = text.find("*/", i + 2)
            if j < 0:
                raise CypherSyntaxError("unterminated block comment", text, i)
            i = j + 2
            continue
        if c.isdigit() or (c == "." and i + 1 < n and text[i + 1].isdigit()):
            j = i
            is_float = False
            if text.startswith("0x", i) or text.startswith("0X", i):
                j = i + 2
                while j < n and (text[j].isdigit() or text[j].lower() in "abcdef"):
                    j += 1
                if j == i + 2:
                    raise CypherSyntaxError("hex literal with no digits", text, i)
                tokens.append(Token("INT", str(int(text[i:j], 16)), i))
                i = j
                continue
            if text.startswith("0o", i) or text.startswith("0O", i):
                j = i + 2
                while j < n and text[j] in "01234567":
                    j += 1
                if j == i + 2:
                    raise CypherSyntaxError("octal literal with no digits", text, i)
                tokens.append(Token("INT", str(int(text[i:j], 8)), i))
                i = j
                continue
            while j < n and text[j].isdigit():
                j += 1
            if j < n and text[j] == "." and not text.startswith("..", j):
                is_float = True
                j += 1
                while j < n and text[j].isdigit():
                    j += 1
            if j < n and text[j] in "eE":
                k = j + 1
                if k < n and text[k] in "+-":
                    k += 1
                if k < n and text[k].isdigit():
                    is_float = True
                    j = k
                    while j < n and text[j].isdigit():
                        j += 1
            tokens.append(Token("FLOAT" if is_float else "INT", text[i:j], i))
            i = j
            continue
        if c in "'\"":
            quote, j, buf = c, i + 1, []
            while j < n:
                ch = text[j]
                if ch == "\\" and j + 1 < n:
                    esc = text[j + 1]
                    mapped = {
                        "n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
                        "\\": "\\", "'": "'", '"': '"',
                    }.get(esc)
                    if esc == "u" and j + 5 < n:
                        buf.append(chr(int(text[j + 2 : j + 6], 16)))
                        j += 6
                        continue
                    buf.append(mapped if mapped is not None else esc)
                    j += 2
                    continue
                if ch == quote:
                    break
                buf.append(ch)
                j += 1
            if j >= n:
                raise CypherSyntaxError("unterminated string literal", text, i)
            tokens.append(Token("STRING", "".join(buf), i))
            i = j + 1
            continue
        if c == "`":
            j = text.find("`", i + 1)
            if j < 0:
                raise CypherSyntaxError("unterminated backtick identifier", text, i)
            tokens.append(Token("NAME", text[i + 1 : j], i))
            i = j + 1
            continue
        if c.isalpha() or c == "_":
            j = i + 1
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            tokens.append(Token("NAME", text[i:j], i))
            i = j
            continue
        if c == "$":
            j = i + 1
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            if j == i + 1:
                raise CypherSyntaxError("empty parameter name", text, i)
            tokens.append(Token("PARAM", text[i + 1 : j], i))
            i = j
            continue
        for sym in _SYMBOLS:
            if text.startswith(sym, i):
                tokens.append(Token("SYM", sym, i))
                i += len(sym)
                break
        else:
            raise CypherSyntaxError(f"unexpected character {c!r}", text, i)
    tokens.append(Token("EOF", "", n))
    return tokens
