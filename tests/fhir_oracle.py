"""Pure-Python oracle for the FHIR fidelity golden tests.

Independent reimplementation of the observable semantics of the
reference's ``process_demo_data`` (``/root/reference/FetchBulkData/
__init__.py:357-536``), driven by the engine's shared constants and a
stubbed NDC lookup table. Written dict-functional (vs the reference's
imperative in-place loop) so the two codebases share only the
behavioral contract.
"""

from __future__ import annotations

import copy

from capgemini_himss24_fhirbulkdata_demo_spark.transforms import constants as C


def _lookup(rxnav: dict[str, dict], ndc: str) -> dict:
    return rxnav.get(ndc, {"name": "", "rxnorm": ""})


def _epic_patient(r: dict) -> dict:
    if r.get("id") == C.EPIC_DEMO_PATIENT_ID:
        r["identifier"] = [copy.deepcopy(C.DEMO_PATIENT_IDENTIFIER)]
    return r


def _cerner_patient(r: dict) -> dict:
    if r.get("id") == C.CERNER_DEMO_PATIENT_ID:
        r.pop("meta", None)
        r["identifier"] = [copy.deepcopy(C.DEMO_PATIENT_IDENTIFIER)]
    return r


def _epic_condition(r: dict) -> dict:
    r["code"] = copy.deepcopy(C.DEMO_CONDITION_CODE)
    r["recordedDate"] = C.DEMO_CONDITION_RECORDED_DATE
    return r


def _epic_medreq(r: dict) -> dict:
    r.pop("medicationReference", None)
    r["medicationCodeableConcept"] = copy.deepcopy(C.DEMO_MEDICATION_CODEABLECONCEPT)
    r["authoredOn"] = C.EPIC_MEDREQ_AUTHORED_ON
    dr = r["dispenseRequest"]
    dr["validityPeriod"]["start"] = C.VALIDITY_PERIOD_START
    dr["validityPeriod"]["end"] = C.VALIDITY_PERIOD_END
    dr["numberOfRepeatsAllowed"] = 2
    dr["quantity"].update(
        {"value": 10, "unit": "ml", "system": "http://unitsofmeasure.org", "code": "ml"}
    )
    return r


def _cerner_medreq(r: dict) -> dict:
    r["authoredOn"] = C.CERNER_MEDREQ_AUTHORED_ON
    dr = r["dispenseRequest"]
    dr["validityPeriod"]["start"] = C.VALIDITY_PERIOD_START
    dr["validityPeriod"]["end"] = C.VALIDITY_PERIOD_END
    return r


def _eob_claim_type(r: dict) -> str | None:
    ct = None
    for c in r.get("type", {}).get("coding", []):
        if c.get("system") == C.CLAIM_TYPE_SYSTEM:
            ct = c.get("code")  # last match wins
    return ct


def _bcda_eob(resources: list[dict], rxnav: dict[str, dict]) -> list[dict]:
    removed: list[str] = []
    out: list[dict] = []
    for r in resources:  # process() already deep-copied
        # engine-divergence policy (documented in transforms/fhir.py):
        # shapes the reference would crash on (missing patient.reference,
        # empty item[], no claim-type coding) are REMOVED, not raised —
        # the oracle mirrors the engine here, not the reference's crash.
        if (r.get("patient") or {}).get("reference") != C.BCDA_DEMO_PATIENT_REF:
            removed.append(r["id"])
        elif _eob_claim_type(r) != "pharmacy":
            removed.append(r["id"])
        else:
            serviced = None
            for item in r.get("item") or []:
                serviced = item.get("servicedDate")  # last item wins
            if serviced is None or serviced < C.SERVICED_DATE_MIN:
                removed.append(r["id"])
            else:
                special = r["id"] == C.BCDA_SPECIAL_EOB_ID
                r.pop("meta", None)
                r["supportingInfo"][0]["valueQuantity"]["value"] = 0
                r["supportingInfo"][1]["valueQuantity"]["value"] = 30 if special else 90
                for item in r["item"]:
                    appended = []
                    for code in item["productOrService"]["coding"]:
                        if code.get("system") != C.NDC_SYSTEM:
                            continue
                        if special:
                            code["code"] = C.SPECIAL_NDC_CODE
                            code["display"] = C.SPECIAL_NDC_DISPLAY
                        info = _lookup(rxnav, code["code"])
                        if info["rxnorm"] == "":
                            removed.append(r["id"])
                            continue
                        if code.get("display") is None:  # absent OR null
                            if info["name"] == "":
                                removed.append(r["id"])
                            else:
                                code["display"] = info["name"]
                        appended.append(
                            {
                                "system": C.RXNORM_SYSTEM,
                                "code": info["rxnorm"],
                                "display": info["name"],
                            }
                        )
                    item["productOrService"]["coding"].extend(appended)
                    item["quantity"]["value"] = 10 if special else 90
                    item["quantity"]["unit"] = "ml" if special else "tabs"
        out.append(r)
    return [r for r in out if r["id"] not in removed]


def process(
    server_url: str,
    resource_name: str,
    resources: list[dict],
    rxnav: dict[str, dict] | None = None,
) -> list[dict]:
    """Oracle twin of the engine's transform registry."""
    resources = copy.deepcopy(resources)
    if "epic" in server_url:
        fn = {
            "Patient": _epic_patient,
            "Condition": _epic_condition,
            "MedicationRequest": _epic_medreq,
        }.get(resource_name)
        return [fn(r) for r in resources] if fn else resources
    if "cerner" in server_url:
        fn = {"Patient": _cerner_patient, "MedicationRequest": _cerner_medreq}.get(
            resource_name
        )
        return [fn(r) for r in resources] if fn else resources
    if "bcda" in server_url and resource_name == "ExplanationOfBenefit":
        return _bcda_eob(resources, rxnav or {})
    return resources
