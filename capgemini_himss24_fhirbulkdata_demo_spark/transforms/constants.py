"""Demo-pipeline data constants.

These are *data values* the reference pipeline writes into resources
(string literals at ``FetchBulkData/__init__.py:361-400,418,430-437,
454-456,489-528``), reproduced here as Python structures. They are
part of the observable output contract, not code.
"""

EPIC_DEMO_PATIENT_ID = "egqBHVfQlt4Bw3XGXoxVxHg3"
CERNER_DEMO_PATIENT_ID = "5123829"
BCDA_DEMO_PATIENT_REF = "Patient/-10000000000027"
BCDA_SPECIAL_EOB_ID = "pde--10000000760"

CLAIM_TYPE_SYSTEM = "http://terminology.hl7.org/CodeSystem/claim-type"
NDC_SYSTEM = "http://hl7.org/fhir/sid/ndc"
RXNORM_SYSTEM = "http://www.nlm.nih.gov/research/umls/rxnorm"

SERVICED_DATE_MIN = "2019-10-30"

DEMO_PATIENT_IDENTIFIER = {
    "system": "http://hl7.org/fhir/sid/us-mbi",
    "type": {
        "coding": [
            {
                "code": "MC",
                "display": "Patient's Medicare number",
                "extension": [
                    {
                        "url": "https://bluebutton.cms.gov/resources/codesystem/identifier-currency",
                        "valueCoding": {
                            "code": "current",
                            "display": "Current",
                            "system": "https://bluebutton.cms.gov/resources/codesystem/identifier-currency",
                        },
                    }
                ],
                "system": "http://terminology.hl7.org/CodeSystem/v2-0203",
            }
        ]
    },
    "value": "1S00E00AA27",
}

DEMO_CONDITION_CODE = {
    "coding": [
        {
            "system": "http://hl7.org/fhir/sid/icd-10-cm",
            "code": "E11.59",
            "display": "Type 2 diabetes mellitus with other circulatory complications",
        }
    ],
    "text": "Type 2 diabetes mellitus with other circulatory complications",
}
DEMO_CONDITION_RECORDED_DATE = "2019-09-04T11:10:27.000Z"

DEMO_MEDICATION_CODEABLECONCEPT = {
    "coding": [
        {
            "system": RXNORM_SYSTEM,
            "code": "106892",
            "display": (
                "insulin isophane, human 70 UNT/ML / insulin, regular, human"
                " 30 UNT/ML Injectable Suspension [Humulin]"
            ),
        }
    ]
}

EPIC_MEDREQ_AUTHORED_ON = "2019-09-04"
CERNER_MEDREQ_AUTHORED_ON = "2019-10-23"
VALIDITY_PERIOD_START = "2019-10-30"
VALIDITY_PERIOD_END = "2020-01-28"

SPECIAL_NDC_CODE = "00002871501"
SPECIAL_NDC_DISPLAY = (
    "insulin isophane, human 70 UNT/ML / insulin, regular, human"
    " 30 UNT/ML Injectable Suspension [Humulin]"
)

RXNAV_URL = "https://rxnav.nlm.nih.gov/REST/ndcstatus.json?ndc="
