"""Status-code mapping tables and the Zipkin status mapper
(translator/trace/grpc_http_mapper.go + translator/trace/zipkin/
status_code.go), as pure Catalyst expressions.

The reference resolves a span's OC status from competing tag sources
with a fixed priority (status_code.go ocStatus):
    census.status_code  >  status.code  >  error  >  http.status_code
with the ``error`` tag parsed as a canonical gRPC code NAME
("NOT_FOUND" → 5; empty string → no code; any other non-empty string
→ code 2 UNKNOWN, used only when every other source is absent), and
``http.status_code`` translated through the HTTP→OC table
(grpc_http_mapper.go:41-69). Messages pair with the winning source;
the error-tag source borrows census/status messages.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# google/rpc/code.proto canonical codes (status_code.go:178-197)
CANONICAL_CODES: dict[str, int] = {
    "OK": 0,
    "CANCELLED": 1,
    "UNKNOWN": 2,
    "INVALID_ARGUMENT": 3,
    "DEADLINE_EXCEEDED": 4,
    "NOT_FOUND": 5,
    "ALREADY_EXISTS": 6,
    "PERMISSION_DENIED": 7,
    "RESOURCE_EXHAUSTED": 8,
    "FAILED_PRECONDITION": 9,
    "ABORTED": 10,
    "OUT_OF_RANGE": 11,
    "UNIMPLEMENTED": 12,
    "INTERNAL": 13,
    "UNAVAILABLE": 14,
    "DATA_LOSS": 15,
    "UNAUTHENTICATED": 16,
}
CODE_NAMES: dict[int, str] = {v: k for k, v in CANONICAL_CODES.items()}

# exact-code rows of the HTTP→OC table (grpc_http_mapper.go:41-50);
# ranges handled in oc_status_from_http
_HTTP_TO_OC: dict[int, int] = {
    401: 16, 403: 7, 404: 5, 429: 8, 499: 1, 501: 12, 503: 14, 504: 4,
}

# OC→HTTP (grpc_http_mapper.go:71-89)
OC_TO_HTTP: dict[int, int] = {
    0: 200, 1: 499, 2: 500, 3: 400, 4: 504, 5: 404, 6: 409, 7: 403,
    8: 429, 9: 412, 10: 409, 11: 416, 12: 501, 13: 500, 14: 503,
    15: 422, 16: 401,
}

_INT32_MIN, _INT32_MAX = -(2 ** 31), 2 ** 31 - 1


def oc_status_from_http(code: Column) -> Column:
    """HTTP status → OC status code (OCStatusCodeFromHTTP):
    1xx-3xx → OK, table rows, else 4xx → INVALID_ARGUMENT,
    5xx → INTERNAL, anything else → UNKNOWN."""
    out = F.when((code >= 100) & (code < 400), F.lit(0))
    for http, oc in _HTTP_TO_OC.items():
        out = out.when(code == http, F.lit(oc))
    return (
        out.when((code >= 400) & (code < 500), F.lit(3))
        .when((code >= 500) & (code < 600), F.lit(13))
        .otherwise(F.lit(2))
    )


def _attrib_to_code(tag: Column) -> Column:
    """Numeric tag value → int32 code, NULL on garbage / overflow
    (attribToStatusCode: int or numeric string, int32 range)."""
    c = tag.try_cast("long")
    return F.when((c >= _INT32_MIN) & (c <= _INT32_MAX), c.cast("int"))


def _canonical_code(name: Column) -> Column:
    out = F.lit(None).cast("int")
    for n, code in CANONICAL_CODES.items():
        out = F.when(name == n, F.lit(code)).otherwise(out)
    return out


def zipkin_status(tags: Column) -> Column:
    """Tag map → struct(code int, message string, has_status boolean)
    with the reference's source priority (status_code.go ocStatus).
    ``has_status`` is false when no source yields a code (the
    reference returns a nil Status)."""
    census = _attrib_to_code(F.element_at(tags, "census.status_code"))
    status = _attrib_to_code(F.element_at(tags, "status.code"))
    http_raw = _attrib_to_code(F.element_at(tags, "http.status_code"))
    http = F.when(http_raw.isNotNull(), oc_status_from_http(http_raw))
    err_raw = F.element_at(tags, "error")
    err_code = _canonical_code(err_raw)
    # error="" → tag acknowledged, no code; other non-canonical
    # non-empty values → UNKNOWN(2), lowest priority
    err_unknown = err_raw.isNotNull() & err_code.isNull() & (err_raw != "")

    census_msg = F.coalesce(
        F.element_at(tags, "census.status_description"),
        F.element_at(tags, "opencensus.status_description"),
    )
    status_msg = F.element_at(tags, "status.message")
    http_msg = F.element_at(tags, "http.status_message")

    code = (
        F.when(census.isNotNull(), census)
        .when(status.isNotNull(), status)
        .when(err_code.isNotNull(), err_code)
        .when(http.isNotNull(), http)
        .when(err_unknown, F.lit(2))
    )
    message = (
        F.when(census.isNotNull(), census_msg)
        .when(status.isNotNull(), status_msg)
        .when(err_code.isNotNull(), F.coalesce(census_msg, status_msg))
        .when(http.isNotNull(), http_msg)
    )
    return F.struct(
        F.coalesce(code, F.lit(0)).alias("code"),
        F.coalesce(message, F.lit("")).alias("message"),
        code.isNotNull().alias("has_status"),
    )


# status-source tags the mapper CONSUMES (fromAttribute returns true):
# they become the span Status, not attributes. http.* and a
# non-canonical error tag stay as attributes, as the reference keeps
# them (status_code.go:85-127).
CONSUMED_STATUS_TAGS = (
    "census.status_code",
    "census.status_description",
    "opencensus.status_description",
    "status.code",
    "status.message",
)


def is_consumed_status_tag(key: Column, value: Column) -> Column:
    consumed = key.isin(*CONSUMED_STATUS_TAGS)
    canonical_or_empty = (value == "") | _canonical_code(value).isNotNull()
    return consumed | ((key == "error") & canonical_or_empty)
