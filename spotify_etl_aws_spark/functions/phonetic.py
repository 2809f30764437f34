"""Phonetic key for blocking (entity resolution / record linkage) —
a Soundex-style code that is INVARIANT to vowel substitutions and
letter doubling, the classic blocking transform for misspelled names
(Odell & Russell 1918 patent family; the blocking-key catalogue in
Christen, *Data Matching*, Springer 2012, §4.3).

Spec ("Soundex-lite", deliberately self-contained so BOTH engines can
evaluate it as pure string expressions — no UDF on the Spark side, no
extension on the DuckDB side):

1. Keep only letters: ``regexp_replace(upper(s), '[^A-Z]', '')``.
2. The key's first character is the first remaining letter.
3. Map every letter to a digit: vowels + Y/H/W -> 0,
   B F P V -> 1, C G J K Q S X Z -> 2, D T -> 3, L -> 4, M N -> 5,
   R -> 6 (the Soundex classes).
4. Collapse runs of the same NON-ZERO digit to one (zeros separate
   runs, approximating classic Soundex's vowel-separator rule; runs
   through H/W collapse — unlike Knuth Soundex, which treats H/W as
   transparent. This is the documented deviation that keeps the code
   expressible without backreferences, which DuckDB's RE2 lacks).
5. Drop the first digit (it codes the first letter, already kept as
   a letter), delete all zeros, take the next 3 digits, right-pad
   with '0' to 4 characters total.

Empty/non-alphabetic input yields '0000' on both engines.

Run-collapapse without backreferences: ``replace(d, 'xx', 'x')``
halves a run of x each pass, so ``ceil(log2(maxlen))`` passes collapse
any run — _PASSES = 6 covers inputs up to 64 letters, and longer
inputs cannot matter because only the first handful of non-zero digits
survive step 5... except a long uncollapsed HEAD run would — so inputs
are truncated to 64 letters first, making the pass count a hard
guarantee, not a heuristic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_FROM = "AEIOUYHWBFPVCGJKQSXZDTLMNR"
_TO = "00000000111122222222334556"
_MAXLEN = 64
_PASSES = 6  # 2^6 = 64 >= _MAXLEN


def phonetic_key(col: Column) -> Column:
    """Spark expression of the module spec — JVM codegen end to end."""
    letters = F.substring(
        F.regexp_replace(F.upper(col), "[^A-Z]", ""), 1, _MAXLEN
    )
    first = F.substring(letters, 1, 1)
    d = F.translate(letters, _FROM, _TO)
    for digit in "123456":
        for _ in range(_PASSES):
            d = F.replace(d, F.lit(digit + digit), F.lit(digit))
    tail = F.replace(F.substring(d, 2, _MAXLEN), F.lit("0"), F.lit(""))
    return F.rpad(F.concat(first, F.substring(tail, 1, 3)), 4, "0")


def phonetic_key_sql(expr: str) -> str:
    """DuckDB SQL twin of ``phonetic_key`` over any string expression —
    generated from the same constants so the two can never drift."""
    letters = f"substring(regexp_replace(upper({expr}), '[^A-Z]', '', 'g'), 1, {_MAXLEN})"
    d = f"translate({letters}, '{_FROM}', '{_TO}')"
    for digit in "123456":
        for _ in range(_PASSES):
            d = f"replace({d}, '{digit + digit}', '{digit}')"
    tail = f"replace(substring({d}, 2, {_MAXLEN}), '0', '')"
    return (
        f"rpad(substring({letters}, 1, 1) || substring({tail}, 1, 3), 4, '0')"
    )
