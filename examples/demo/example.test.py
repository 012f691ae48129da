"""Golden fixtures (reference: examples/demo/example.test.lua)."""


def fixtures():
    return [
        (None, {
            "redundantField": 7,
            "notValid": True,
            "person": {"name": "roEl", "species": "human"},
            "fingers_lh": 7,
            "fingers_rh": 7,
        }),
        (None, {
            "redundantField": 127,
            "notValid": False,
            "person": {"name": "ROELLL", "species": "homo sapiens"},
            "fingers_lh": 1,
            "fingers_rh": 3,
        }),
    ]


def expectations():
    return [
        (None, {"valid": False, "name": "roel", "fingers": 14}),
        (None, {"valid": True, "name": "roelll", "fingers": 4}),
    ]
