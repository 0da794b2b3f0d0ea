"""One-shot converter: bundle the public record-linkage benchmark datasets
(FEBRL 1-3, PATSTAT patents, RLdata500/10000) as parquet under
mismo_ray/_data/.

Sources are the public CSVs shipped with the reference repo
(reference mismo/_data/_datasets/*; originally from the Febrl project, the
dedupe patent example, and the RecordLinkage R package). Schemas follow
reference mismo/playdata.py:33-46,151-162,173-183. Run from the repo root:

    python tools/make_playdata.py
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq

SRC = "/root/reference/mismo/_data/_datasets"
DST = os.path.join(os.path.dirname(__file__), "..", "mismo_ray", "_data")

FEBRL_SCHEMA = {
    "record_id": pa.uint16(),
    "label_true": pa.uint16(),
    "given_name": pa.string(),
    "surname": pa.string(),
    "street_number": pa.string(),  # keep as string for leading 0s
    "address_1": pa.string(),
    "address_2": pa.string(),
    "suburb": pa.string(),
    "postcode": pa.string(),  # keep as string for leading 0s
    "state": pa.string(),
    "date_of_birth": pa.string(),  # contains some BS dates like 19371233
    "soc_sec_id": pa.int32(),
}

PATENTS_SCHEMA = {
    "record_id": pa.uint32(),
    "label_true": pa.uint32(),
    "name_true": pa.string(),
    "name": pa.string(),
    "latitude": pa.float64(),
    "longitude": pa.float64(),
    "coauthors": pa.string(),
    "classes": pa.string(),
}

RLDATA_SCHEMA = {
    "record_id": pa.int64(),
    "label_true": pa.int64(),
    "fname_c1": pa.string(),
    "fname_c2": pa.string(),
    "lname_c1": pa.string(),
    "lname_c2": pa.string(),
    "by": pa.int64(),
    "bm": pa.int64(),
    "bd": pa.int64(),
}


AFFILIATIONS_SCHEMA = {
    "record_id": pa.int64(),
    "label_true": pa.int64(),
    "affiliation": pa.string(),
}


def convert(src_csv: str, dst_parquet: str, schema: dict, sort_by: str | None):
    read_as = {
        k: (pa.string() if pa.types.is_string(v) else v) for k, v in schema.items()
    }
    t = pacsv.read_csv(
        src_csv,
        convert_options=pacsv.ConvertOptions(column_types=read_as),
    )
    t = t.select(list(schema.keys()))
    t = t.cast(pa.schema(list(schema.items())))
    if sort_by:
        t = t.sort_by(sort_by)
    pq.write_table(t, dst_parquet, compression="zstd")
    print(f"{dst_parquet}: {t.num_rows} rows")


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for i in (1, 2, 3):
        convert(
            f"{SRC}/febrl/dataset{i}.csv",
            f"{DST}/febrl{i}.parquet",
            FEBRL_SCHEMA,
            None,
        )
    convert(
        f"{SRC}/patstat/patents.csv",
        f"{DST}/patents.parquet",
        PATENTS_SCHEMA,
        "record_id",  # reference orders by record_id (playdata.py:250-255)
    )
    convert(
        f"{SRC}/rldata/RLdata500.csv", f"{DST}/rldata500.parquet", RLDATA_SCHEMA, None
    )
    convert(
        f"{SRC}/rldata/RLdata10000.csv",
        f"{DST}/rldata10000.parquet",
        RLDATA_SCHEMA,
        None,
    )
    convert(
        f"{SRC}/leipzig/affiliations.csv",
        f"{DST}/affiliations.parquet",
        AFFILIATIONS_SCHEMA,
        "record_id",
    )


if __name__ == "__main__":
    main()
