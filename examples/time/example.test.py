"""Golden fixtures (reference: examples/time/example.test.lua) —
the middle record's value "three" doesn't parse and must be dropped."""


def fixtures():
    return [
        ("2016-05-13T16:43:12.345+00:00", "42"),
        ("2014-11-24T23:16:42.345+01:00", "three"),
        ("2016-05-13T16:43:13.37Z", "37"),
    ]


def expectations():
    return [
        (1463157792345, 42),
        (1463157793370, 37),
    ]
