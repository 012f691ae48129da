"""Golden fixtures (reference: examples/csv/example.test.lua) —
three unhappy-path rows must be dropped, an empty blog becomes NULL."""


def fixtures():
    return [
        (None, "fail,2012-09-03T11:33:46Z,2"),
        (None, "dudebowski,2012-09-03T11:33:46Z,,2"),
        (None, ""),
        (None, "rollulus,2015-01-14T07:36:24Z,https://keybase.io/rollulus,8"),
        (None, "error"),
    ]


def expectations():
    return [
        (None, {
            "login": "dudebowski",
            "created_at": "2012-09-03T11:33:46Z",
            "blog": None,
            "public_repos": 2,
        }),
        (None, {
            "login": "rollulus",
            "created_at": "2015-01-14T07:36:24Z",
            "blog": "https://keybase.io/rollulus",
            "public_repos": 8,
        }),
    ]
