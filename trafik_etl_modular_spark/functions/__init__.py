from trafik_etl_modular_spark.functions.scalars import (  # noqa: F401
    dsum,
    davg,
    derive_status,
    fmt_utc_z,
    parse_iso_utc,
    status_rank,
    truncate_ellipsis,
    wkt_point_lat,
    wkt_point_lon,
)
