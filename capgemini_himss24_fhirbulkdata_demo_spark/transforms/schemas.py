"""Curated FHIR resource schemas (SURVEY §1.2 "declared-with-fallback").

StructTypes cover the union of (a) fields the reference touches
(FIXTURES.md §B, derived from ``FetchBulkData/__init__.py:357-536``),
(b) fields the literals it writes introduce (e.g. the Medicare
identifier's ``extension``), and (c) pass-through decoys used by the
golden tests. Unknown real-world fields ride along by extending these
schemas or by the raw-passthrough column pattern in sources/ndjson.

Spark's null-on-missing ``from_json`` semantics reproduce the
reference's tolerate-missing-field behavior (``__init__.py:425-428``);
``to_json`` dropping null fields reproduces its absent-key output.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _s(*fields: StructField) -> StructType:
    return StructType(list(fields))


def _f(name: str, dtype) -> StructField:
    return StructField(name, dtype, nullable=True)


_CODING = _s(
    _f("system", StringType()),
    _f("code", StringType()),
    _f("display", StringType()),
)

# identifier coding carries the Medicare-currency extension written by
# the demo literal (constants.DEMO_PATIENT_IDENTIFIER).
_IDENTIFIER_CODING = _s(
    _f("code", StringType()),
    _f("display", StringType()),
    _f(
        "extension",
        ArrayType(
            _s(
                _f("url", StringType()),
                _f(
                    "valueCoding",
                    _s(
                        _f("code", StringType()),
                        _f("display", StringType()),
                        _f("system", StringType()),
                    ),
                ),
            )
        ),
    ),
    _f("system", StringType()),
)

_META = _s(_f("versionId", StringType()), _f("lastUpdated", StringType()))

PATIENT_SCHEMA = _s(
    _f("resourceType", StringType()),
    _f("id", StringType()),
    _f("meta", _META),
    _f(
        "identifier",
        ArrayType(
            _s(
                _f("system", StringType()),
                _f("type", _s(_f("coding", ArrayType(_IDENTIFIER_CODING)))),
                _f("value", StringType()),
            )
        ),
    ),
    # decoys (round-trip unchanged)
    _f("name", ArrayType(_s(_f("family", StringType()), _f("given", ArrayType(StringType()))))),
    _f("gender", StringType()),
    _f("birthDate", StringType()),
)

CONDITION_SCHEMA = _s(
    _f("resourceType", StringType()),
    _f("id", StringType()),
    _f("code", _s(_f("coding", ArrayType(_CODING)), _f("text", StringType()))),
    _f("recordedDate", StringType()),
    # decoys
    _f("clinicalStatus", _s(_f("coding", ArrayType(_CODING)))),
    _f("subject", _s(_f("reference", StringType()))),
)

MEDICATION_REQUEST_SCHEMA = _s(
    _f("resourceType", StringType()),
    _f("id", StringType()),
    _f("medicationReference", _s(_f("reference", StringType()), _f("display", StringType()))),
    _f("medicationCodeableConcept", _s(_f("coding", ArrayType(_CODING)))),
    _f("authoredOn", StringType()),
    _f(
        "dispenseRequest",
        _s(
            _f("validityPeriod", _s(_f("start", StringType()), _f("end", StringType()))),
            _f("numberOfRepeatsAllowed", LongType()),
            _f(
                "quantity",
                _s(
                    _f("value", DoubleType()),
                    _f("unit", StringType()),
                    _f("system", StringType()),
                    _f("code", StringType()),
                ),
            ),
        ),
    ),
    # decoys
    _f("status", StringType()),
    _f("subject", _s(_f("reference", StringType()))),
)

EXPLANATION_OF_BENEFIT_SCHEMA = _s(
    _f("resourceType", StringType()),
    _f("id", StringType()),
    _f("meta", _s(_f("versionId", StringType()))),
    _f("patient", _s(_f("reference", StringType()))),
    _f("type", _s(_f("coding", ArrayType(_CODING)))),
    _f(
        "supportingInfo",
        ArrayType(
            _s(
                _f("sequence", LongType()),
                _f("valueQuantity", _s(_f("value", DoubleType()))),
            )
        ),
    ),
    _f(
        "item",
        ArrayType(
            _s(
                _f("servicedDate", StringType()),
                _f("productOrService", _s(_f("coding", ArrayType(_CODING)))),
                _f(
                    "quantity",
                    _s(_f("value", DoubleType()), _f("unit", StringType())),
                ),
            )
        ),
    ),
    # decoys
    _f("status", StringType()),
)

RXNAV_LOOKUP_SCHEMA = _s(
    _f("ndc", StringType()),
    _f("name", StringType()),
    _f("rxnorm", StringType()),
)

RESOURCE_SCHEMAS = {
    "Patient": PATIENT_SCHEMA,
    "Condition": CONDITION_SCHEMA,
    "MedicationRequest": MEDICATION_REQUEST_SCHEMA,
    "ExplanationOfBenefit": EXPLANATION_OF_BENEFIT_SCHEMA,
}
