"""Double Metaphone phonetic encoding — pure-python implementation of
Lawrence Philips' published algorithm (C/C++ reference behavior; the
algorithm itself is public domain). Replaces the optional DoubleMetaphone
package the reference shells out to (reference/mismo/text/_similarity.py:9-36).

``double_metaphone(s) -> (primary, secondary)`` where ``secondary`` is ""
when it equals the primary (the convention of the dedupeio package the
reference wraps; its doctest: catherine -> ['K0RN', 'KTRN'], "" -> ['', '']).
"""

from __future__ import annotations

VOWELS = frozenset("AEIOUY")


def _is_vowel(s: str, i: int) -> bool:
    return 0 <= i < len(s) and s[i] in VOWELS


def _slavo_germanic(s: str) -> bool:
    return any(x in s for x in ("W", "K", "CZ", "WITZ"))


def _at(s: str, i: int, *subs: str) -> bool:
    """True when any of subs occurs at position i."""
    if i < 0:
        return False
    return any(s[i : i + len(sub)] == sub for sub in subs)


def double_metaphone_tuple(value: str) -> tuple[str, str]:
    s = value.upper()
    # keep spaces (the "VAN ", "VON ", "SAN " and "MAC C" context rules need
    # them); strip other non-alpha (ASCII scope — callers normalize accents
    # upstream via text.strip_accents)
    s = "".join(c for c in s if "A" <= c <= "Z" or c == " ")
    length = len(s)
    if length == 0:
        return "", ""
    last = length - 1
    sg = _slavo_germanic(s)
    pri: list[str] = []
    sec: list[str] = []

    def add(p: str, a: str | None = None) -> None:
        pri.append(p)
        sec.append(p if a is None else a)

    i = 0
    # skip silent letters at start
    if _at(s, 0, "GN", "KN", "PN", "WR", "PS"):
        i = 1
    # initial X is pronounced Z (e.g. Xavier)
    if s[0] == "X":
        add("S")
        i = 1

    while i < length:
        c = s[i]
        if c in "AEIOUY":
            if i == 0:
                add("A")
            i += 1
            continue
        if c == "B":
            add("P")
            i += 2 if _at(s, i + 1, "B") else 1
            continue
        if c == "C":
            # various germanic
            if (
                i > 1
                and not _is_vowel(s, i - 2)
                and _at(s, i - 1, "ACH")
                and not _at(s, i + 2, "I")
                and (not _at(s, i + 2, "E") or _at(s, i - 2, "BACHER", "MACHER"))
            ):
                add("K")
                i += 2
                continue
            if i == 0 and _at(s, 0, "CAESAR"):
                add("S")
                i += 2
                continue
            if _at(s, i, "CHIA"):  # italian
                add("K")
                i += 2
                continue
            if _at(s, i, "CH"):
                if i > 0 and _at(s, i, "CHAE"):  # michael
                    add("K", "X")
                    i += 2
                    continue
                if (
                    i == 0
                    and (_at(s, i + 1, "HARAC", "HARIS")
                         or _at(s, i + 1, "HOR", "HYM", "HIA", "HEM"))
                    and not _at(s, 0, "CHORE")
                ):
                    add("K")
                    i += 2
                    continue
                if (
                    _at(s, 0, "VAN ", "VON ") or _at(s, 0, "SCH")
                    or _at(s, i - 2, "ORCHES", "ARCHIT", "ORCHID")
                    or _at(s, i + 2, "T", "S")
                    or (
                        (i == 0 or _at(s, i - 1, "A", "O", "U", "E"))
                        and _at(s, i + 2, "L", "R", "N", "M", "B", "H", "F", "V", "W", " ")
                    )
                ):
                    add("K")
                else:
                    if i > 0:
                        if _at(s, 0, "MC"):
                            add("K")
                        else:
                            add("X", "K")
                    else:
                        add("X")
                i += 2
                continue
            if _at(s, i, "CZ") and not _at(s, i - 2, "WICZ"):
                add("S", "X")
                i += 2
                continue
            if _at(s, i + 1, "CIA"):  # focaccia
                add("X")
                i += 3
                continue
            if _at(s, i, "CC") and not (i == 1 and s[0] == "M"):
                # double C but not McClellan
                if _at(s, i + 2, "I", "E", "H") and not _at(s, i + 2, "HU"):
                    if (i == 1 and _at(s, i - 1, "A")) or _at(
                        s, i - 1, "UCCEE", "UCCES"
                    ):
                        add("KS")  # accident, accede, succeed
                    else:
                        add("X")  # bacci, bertucci
                    i += 3
                    continue
                add("K")  # pierce's rule
                i += 2
                continue
            if _at(s, i, "CK", "CG", "CQ"):
                add("K")
                i += 2
                continue
            if _at(s, i, "CI", "CE", "CY"):
                if _at(s, i, "CIO", "CIE", "CIA"):  # italian vs systematic
                    add("S", "X")
                else:
                    add("S")
                i += 2
                continue
            add("K")
            if _at(s, i + 1, " C", " Q", " G"):  # mac caffrey, mac gregor
                i += 3
            elif _at(s, i + 1, "C", "K", "Q") and not _at(s, i + 1, "CE", "CI"):
                i += 2
            else:
                i += 1
            continue
        if c == "D":
            if _at(s, i, "DG"):
                if _at(s, i + 2, "I", "E", "Y"):  # edge
                    add("J")
                    i += 3
                    continue
                add("TK")  # edgar
                i += 2
                continue
            if _at(s, i, "DT", "DD"):
                add("T")
                i += 2
                continue
            add("T")
            i += 1
            continue
        if c == "F":
            add("F")
            i += 2 if _at(s, i + 1, "F") else 1
            continue
        if c == "G":
            if _at(s, i + 1, "H"):
                if i > 0 and not _is_vowel(s, i - 1):
                    add("K")
                    i += 2
                    continue
                if i == 0:
                    if _at(s, i + 2, "I"):  # ghislane
                        add("J")
                    else:
                        add("K")  # ghoul
                    i += 2
                    continue
                if (
                    _at(s, i - 2, "B", "H", "D")
                    or _at(s, i - 3, "B", "H", "D")
                    or _at(s, i - 4, "B", "H")
                ):
                    i += 2  # silent: hugh, bough, broughton
                    continue
                if i > 2 and _at(s, i - 1, "U") and _at(s, i - 3, "C", "G", "L", "R", "T"):
                    add("F")  # laugh, cough, rough, tough
                elif i > 0 and s[i - 1] != "I":
                    add("K")
                i += 2
                continue
            if _at(s, i + 1, "N"):
                if i == 1 and _is_vowel(s, 0) and not sg:
                    add("KN", "N")
                elif not _at(s, i + 2, "EY") and s[i + 1 :] != "N" and not sg:
                    add("N", "KN")
                else:
                    add("KN")
                i += 2
                continue
            if _at(s, i + 1, "LI") and not sg:  # tagliaro
                add("KL", "L")
                i += 2
                continue
            if i == 0 and (
                _at(s, i + 1, "Y")
                or _at(s, i + 1, "ES", "EP", "EB", "EL", "EY", "IB", "IL", "IN", "IE", "EI", "ER")
            ):
                add("K", "J")  # ges-, gep- etc
                i += 2
                continue
            if (
                (_at(s, i + 1, "ER") or _at(s, i + 1, "Y"))
                and not _at(s, 0, "DANGER", "RANGER", "MANGER")
                and not _at(s, i - 1, "E", "I")
                and not _at(s, i - 1, "RGY", "OGY")
            ):
                add("K", "J")  # -ger-, -gy-
                i += 2
                continue
            if _at(s, i + 1, "E", "I", "Y") or _at(s, i - 1, "AGGI", "OGGI"):
                if _at(s, 0, "VAN ", "VON ") or _at(s, 0, "SCH") or _at(s, i + 1, "ET"):
                    add("K")  # germanic
                elif _at(s, i + 1, "IER "):
                    add("J")
                elif s[i + 1 :] == "IER":
                    add("J")
                else:
                    add("J", "K")
                i += 2
                continue
            add("K")
            i += 2 if _at(s, i + 1, "G") else 1
            continue
        if c == "H":
            # keep only when between vowels or at start before vowel
            if (i == 0 or _is_vowel(s, i - 1)) and _is_vowel(s, i + 1):
                add("H")
                i += 2
                continue
            i += 1
            continue
        if c == "J":
            if _at(s, i, "JOSE") or _at(s, 0, "SAN "):
                if (i == 0 and s[i + 4 : i + 5] == " ") or length == 4 or _at(s, 0, "SAN "):
                    add("H")  # jose / san jacinto
                else:
                    add("J", "H")
                i += 1
                continue
            if i == 0 and not _at(s, i, "JOSE"):
                add("J", "A")  # yankelovich/jankelowicz
            elif _is_vowel(s, i - 1) and not sg and _at(s, i + 1, "A", "O"):
                add("J", "H")
            elif i == last:
                add("J", "")
            elif not _at(s, i + 1, "L", "T", "K", "S", "N", "M", "B", "Z") and not _at(
                s, i - 1, "S", "K", "L"
            ):
                add("J")
            i += 2 if _at(s, i + 1, "J") else 1
            continue
        if c == "K":
            add("K")
            i += 2 if _at(s, i + 1, "K") else 1
            continue
        if c == "L":
            if _at(s, i + 1, "L"):
                # spanish: cabrillo, gallegos
                if (
                    i == length - 3 and _at(s, i - 1, "ILLO", "ILLA", "ALLE")
                ) or (
                    (_at(s, last - 1, "AS", "OS") or _at(s, last, "A", "O"))
                    and _at(s, i - 1, "ALLE")
                ):
                    add("L", "")
                    i += 2
                    continue
                i += 2
            else:
                i += 1
            add("L")
            continue
        if c == "M":
            if (
                _at(s, i - 1, "UMB")
                and (i + 1 == last or _at(s, i + 2, "ER"))
            ) or _at(s, i + 1, "M"):
                i += 2  # dumb, thumb
            else:
                i += 1
            add("M")
            continue
        if c == "N":
            add("N")
            i += 2 if _at(s, i + 1, "N") else 1
            continue
        if c == "P":
            if _at(s, i + 1, "H"):
                add("F")
                i += 2
                continue
            add("P")
            i += 2 if _at(s, i + 1, "P", "B") else 1
            continue
        if c == "Q":
            add("K")
            i += 2 if _at(s, i + 1, "Q") else 1
            continue
        if c == "R":
            # french: rogier, but not hochmeier
            if (
                i == last
                and not sg
                and _at(s, i - 2, "IE")
                and not _at(s, i - 4, "ME", "MA")
            ):
                add("", "R")
            else:
                add("R")
            i += 2 if _at(s, i + 1, "R") else 1
            continue
        if c == "S":
            if _at(s, i - 1, "ISL", "YSL"):  # island, carlisle
                i += 1
                continue
            if i == 0 and _at(s, i, "SUGAR"):
                add("X", "S")
                i += 1
                continue
            if _at(s, i, "SH"):
                if _at(s, i + 1, "HEIM", "HOEK", "HOLM", "HOLZ"):
                    add("S")  # germanic
                else:
                    add("X")
                i += 2
                continue
            if _at(s, i, "SIO", "SIA") or _at(s, i, "SIAN"):
                if not sg:
                    add("S", "X")
                else:
                    add("S")
                i += 3
                continue
            if (i == 0 and _at(s, i + 1, "M", "N", "L", "W")) or _at(s, i + 1, "Z"):
                # german/anglicization: smith -> XMT secondary
                add("S", "X")
                i += 2 if _at(s, i + 1, "Z") else 1
                continue
            if _at(s, i, "SC"):
                if s[i + 2 : i + 3] == "H":  # schlesinger etc.
                    if _at(s, i + 3, "OO", "ER", "EN", "UY", "ED", "EM"):
                        if _at(s, i + 3, "ER", "EN"):
                            add("X", "SK")  # schermerhorn, schenker
                        else:
                            add("SK")  # school, schooner
                        i += 3
                        continue
                    if i == 0 and not _is_vowel(s, 3) and s[3:4] != "W":
                        add("X", "S")
                    else:
                        add("X")
                    i += 3
                    continue
                if _at(s, i + 2, "I", "E", "Y"):
                    add("S")
                    i += 3
                    continue
                add("SK")
                i += 3
                continue
            if i == last and _at(s, i - 2, "AI", "OI"):
                add("", "S")  # french: resnais, artois
            else:
                add("S")
            i += 2 if _at(s, i + 1, "S", "Z") else 1
            continue
        if c == "T":
            if _at(s, i, "TION") or _at(s, i, "TIA", "TCH"):
                add("X")
                i += 3
                continue
            if _at(s, i, "TH") or _at(s, i, "TTH"):
                if _at(s, i + 2, "OM", "AM") or _at(s, 0, "VAN ", "VON ") or _at(s, 0, "SCH"):
                    add("T")  # thomas, thames, germanic
                else:
                    add("0", "T")
                i += 2
                continue
            add("T")
            i += 2 if _at(s, i + 1, "T", "D") else 1
            continue
        if c == "V":
            add("F")
            i += 2 if _at(s, i + 1, "V") else 1
            continue
        if c == "W":
            if _at(s, i, "WR"):
                add("R")
                i += 2
                continue
            if i == 0 and (_is_vowel(s, i + 1) or _at(s, i, "WH")):
                if _is_vowel(s, i + 1):
                    add("A", "F")  # wasserman
                else:
                    add("A")  # wharton
            if (
                (i == last and _is_vowel(s, i - 1))
                or _at(s, i - 1, "EWSKI", "EWSKY", "OWSKI", "OWSKY")
                or _at(s, 0, "SCH")
            ):
                add("", "F")  # arnow
                i += 1
                continue
            if _at(s, i, "WICZ", "WITZ"):
                add("TS", "FX")
                i += 4
                continue
            i += 1
            continue
        if c == "X":
            if not (
                i == last
                and (_at(s, i - 3, "IAU", "EAU") or _at(s, i - 2, "AU", "OU"))
            ):
                add("KS")  # not french: breaux
            i += 2 if _at(s, i + 1, "C", "X") else 1
            continue
        if c == "Z":
            if _at(s, i + 1, "H"):
                add("J")  # chinese: zhao
                i += 2
                continue
            if _at(s, i + 1, "ZO", "ZI", "ZA") or (sg and i > 0 and s[i - 1] != "T"):
                add("S", "TS")
            else:
                add("S")
            i += 2 if _at(s, i + 1, "Z") else 1
            continue
        i += 1

    p = "".join(pri)
    a = "".join(sec)
    return p, "" if a == p else a


def double_metaphone_py(s: str | None) -> list[str] | None:
    """Reference-shaped wrapper: list [primary, secondary] / None for null
    (reference doctest: catherine -> ['K0RN', 'KTRN'], '' -> ['', ''])."""
    if s is None:
        return None
    p, a = double_metaphone_tuple(s)
    return [p, a]
