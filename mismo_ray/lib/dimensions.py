"""Per-domain Dimension classes: prepare -> block -> compare over Datasets.

Reference API parity (a mismo user drives these the same way):
- NameDimension      (reference mismo/lib/name/_dimension.py:8-73)
- EmailsDimension    (reference mismo/lib/email/_core.py:136-199)
- PhonesDimension    (reference mismo/lib/phone/_core.py:132-190)
- AddressesDimension (reference mismo/lib/geo/_address.py:205-290)

Hook shapes (Ray mapping of the reference's Table -> Table mutations):
- ``prepare_for_fast_linking(ds)``: add the normalized/parsed column(s) —
  stateless vectorized ``map_batches``.
- ``prepare_for_blocking(ds)``: add token/keyword columns (the Addresses
  dimension also computes corpus-level rare street-trigrams distributed and
  broadcast-filters with them, as the reference does with
  ``sets.rare_terms``).
- ``block(left, right)``: a Linkage from the dimension's natural linker
  (UnnestLinker over the prepared arrays).
- ``compare(pairs)``: add ``{column}_compared`` — for collection dimensions
  the MIN (= best) match level over the cross product of the two sides'
  values, ELSE when either side is empty (reference ``array_combinations``
  + ``array_min`` + ``fill_null(ELSE)``).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from mismo_ray.lib import address as _address
from mismo_ray.lib import email as _email
from mismo_ray.lib import name as _name
from mismo_ray.lib import phone as _phone
from mismo_ray.types import Linkage


def _min_cross_level(list_l, list_r, level_fn, else_level: int) -> int:
    if not list_l or not list_r:
        return else_level
    return min(level_fn(a, b) for a in list_l for b in list_r)


def _clean_string_list(values, clean_fn) -> list | None:
    if values is None:
        return None
    out: list[str] = []
    for v in values:
        c = clean_fn(v)
        if c is not None and c not in out:
            out.append(c)
    return out


class NameDimension:
    """Single name-struct column: normalize -> tokens -> tiered compare
    (struct<prefix, given, middle, surname, suffix, nickname>)."""

    def __init__(
        self,
        column: str,
        *,
        column_normed: str = "{column}_normed",
        column_tokens: str = "{column}_tokens",
        column_compared: str = "{column}_compared",
    ):
        self.column = column
        self.column_normed = column_normed.format(column=column)
        self.column_tokens = column_tokens.format(column=column)
        self.column_compared = column_compared.format(column=column)

    def prepare_for_fast_linking(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        col, out = self.column, self.column_normed

        def fn(t: pa.Table) -> pa.Table:
            normed = [_name.normalize_name(v) for v in t[col].to_pylist()]
            return t.append_column(
                out, pa.array(normed, type=t.schema.field(col).type)
            )

        return ds.map_batches(fn, batch_format="pyarrow")

    def prepare_for_blocking(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        src, out = self.column_normed, self.column_tokens

        def fn(t: pa.Table) -> pa.Table:
            toks = [_name.name_tokens(v) for v in t[src].to_pylist()]
            return t.append_column(out, pa.array(toks, type=pa.list_(pa.string())))

        return ds.map_batches(fn, batch_format="pyarrow")

    def block(self, left: ray.data.Dataset, right: ray.data.Dataset) -> Linkage:
        from mismo_ray.linker._unnest import UnnestLinker

        return UnnestLinker(self.column_tokens)(left, right)

    def compare(self, pairs: ray.data.Dataset) -> ray.data.Dataset:
        src, out = self.column_normed, self.column_compared

        def fn(t: pa.Table) -> pa.Table:
            lv = [
                _name.match_level(a, b)
                for a, b in zip(
                    t[f"{src}_l"].to_pylist(), t[f"{src}_r"].to_pylist()
                )
            ]
            return t.append_column(out, pa.array(lv, type=pa.int64()))

        return pairs.map_batches(fn, batch_format="pyarrow")


class _CollectionDimension:
    """Shared machinery for array<string> dimensions (emails, phones)."""

    _clean_fn = staticmethod(lambda v: v)
    _level_fn = staticmethod(lambda a, b: 0)
    _else_level = 0

    def __init__(
        self,
        column: str,
        *,
        column_cleaned: str = "{column}_cleaned",
        column_compared: str = "{column}_compared",
    ):
        self.column = column
        self.column_cleaned = column_cleaned.format(column=column)
        self.column_compared = column_compared.format(column=column)

    def prepare_for_fast_linking(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        col, out, clean = self.column, self.column_cleaned, self._clean_fn

        def fn(t: pa.Table) -> pa.Table:
            vals = [
                _clean_string_list(v, clean) for v in t[col].to_pylist()
            ]
            return t.append_column(out, pa.array(vals, type=pa.list_(pa.string())))

        return ds.map_batches(fn, batch_format="pyarrow")

    def prepare_for_blocking(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        return ds  # noop (reference parity)

    def block(self, left: ray.data.Dataset, right: ray.data.Dataset) -> Linkage:
        from mismo_ray.linker._unnest import UnnestLinker

        return UnnestLinker(self.column_cleaned)(left, right)

    def compare(self, pairs: ray.data.Dataset) -> ray.data.Dataset:
        src, out = self.column_cleaned, self.column_compared
        level, else_level = self._level_fn, self._else_level

        def fn(t: pa.Table) -> pa.Table:
            lv = [
                _min_cross_level(a, b, level, else_level)
                for a, b in zip(
                    t[f"{src}_l"].to_pylist(), t[f"{src}_r"].to_pylist()
                )
            ]
            return t.append_column(out, pa.array(lv, type=pa.int64()))

        return pairs.map_batches(fn, batch_format="pyarrow")


class EmailsDimension(_CollectionDimension):
    """array<string> of email addresses; best cross-pair EmailMatchLevel."""

    _clean_fn = staticmethod(
        lambda v: _email.clean_email(v, normalize=True)
    )
    _level_fn = staticmethod(_email.match_level)
    _else_level = _email.ELSE


class PhonesDimension(_CollectionDimension):
    """array<string> of phone numbers; best cross-pair PhoneMatchLevel."""

    _clean_fn = staticmethod(_phone.clean_phone_number)
    _level_fn = staticmethod(_phone.match_level)
    _else_level = _phone.ELSE


class AddressesDimension:
    """array<address struct> column: normalize -> featurize + rare street
    trigram keywords (corpus-level document frequencies computed distributed)
    -> UnnestLinker blocking -> best cross-pair AddressMatchLevel."""

    def __init__(
        self,
        column: str,
        *,
        column_cleaned: str = "{column}_cleaned",
        column_keywords: str = "{column}_keywords",
        column_compared: str = "{column}_compared",
        max_records_n: int = 500,
    ):
        self.column = column
        self.column_cleaned = column_cleaned.format(column=column)
        self.column_keywords = column_keywords.format(column=column)
        self.column_compared = column_compared.format(column=column)
        self.max_records_n = max_records_n

    def prepare_for_fast_linking(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        col, out = self.column, self.column_cleaned

        def fn(t: pa.Table) -> pa.Table:
            vals = [
                None if v is None else [_address.norm_address(a) for a in v]
                for v in t[col].to_pylist()
            ]
            return t.append_column(
                out, pa.array(vals, type=t.schema.field(col).type)
            )

        return ds.map_batches(fn, batch_format="pyarrow")

    def prepare_for_blocking(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        """Add ``{column}_keywords``: the record's unique street trigrams
        restricted to RARE ones (document frequency <= max_records_n,
        computed with one distributed groupby — reference
        ``sets.rare_terms`` + ``array_filter_isin_other``)."""
        import ray as _ray

        from mismo_ray.sets import rare_terms

        src, out = self.column_cleaned, self.column_keywords

        def trigrams(t: pa.Table) -> pa.Table:
            toks = []
            for v in t[src].to_pylist():
                grams: list[str] = []
                for a in v or []:
                    f = _address.featurize_address(a) or {}
                    for g in f.get("street_trigrams") or []:
                        if g not in grams:
                            grams.append(g)
                toks.append(grams)
            return t.append_column(
                "__trigrams__", pa.array(toks, type=pa.list_(pa.string()))
            )

        with_grams = ds.map_batches(trigrams, batch_format="pyarrow")
        rare = rare_terms(
            with_grams.select_columns(["__trigrams__"]),
            "__trigrams__",
            max_records_n=self.max_records_n,
        )
        rare_set = frozenset(r["term"] for r in rare.take_all())
        ref = _ray.put(rare_set)

        def keep_rare(t: pa.Table) -> pa.Table:
            keep = _ray.get(ref)
            vals = [
                [g for g in (v or []) if g in keep]
                for v in t["__trigrams__"].to_pylist()
            ]
            t = t.drop_columns(["__trigrams__"])
            return t.append_column(out, pa.array(vals, type=pa.list_(pa.string())))

        return with_grams.map_batches(keep_rare, batch_format="pyarrow")

    def block(self, left: ray.data.Dataset, right: ray.data.Dataset) -> Linkage:
        from mismo_ray.linker._unnest import UnnestLinker

        return UnnestLinker(self.column_keywords)(left, right)

    def compare(self, pairs: ray.data.Dataset) -> ray.data.Dataset:
        src, out = self.column_cleaned, self.column_compared

        def fn(t: pa.Table) -> pa.Table:
            lv = [
                _min_cross_level(a, b, _address.match_level, _address.ELSE)
                for a, b in zip(
                    t[f"{src}_l"].to_pylist(), t[f"{src}_r"].to_pylist()
                )
            ]
            return t.append_column(out, pa.array(lv, type=pa.int64()))

        return pairs.map_batches(fn, batch_format="pyarrow")
