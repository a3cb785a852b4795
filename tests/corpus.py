"""The BFL correctness corpus — ported golden rows.

Source of truth: the reference's own test tables
(``/root/reference/server/lib/eval_test.go:14-348``). Each row is
``(query, json, truth, limit, new_json)``; ``new_json`` differs from
``json`` only when ``redact`` ran. This is THE oracle for §1.3 semantics
(SURVEY.md §5: "port the eval_test.go table as the correctness corpus").
"""

R = "[REDACTED]"

# (query, json, truth, limit, new_json) — eval_test.go:21-157
EVAL_ROWS = [
    (r'true and true', r'{}', True, 0, r'{}'),
    (r'true and false', r'{}', False, 0, r'{}'),
    (r'false and true', r'{}', False, 0, r'{}'),
    (r'false and false', r'{}', False, 0, r'{}'),
    (r'true or true', r'{}', True, 0, r'{}'),
    (r'false or true', r'{}', True, 0, r'{}'),
    (r'true or false', r'{}', True, 0, r'{}'),
    (r'false or false', r'{}', False, 0, r'{}'),
    (r'true and 5', r'{}', True, 0, r'{}'),
    (r'false and 5', r'{}', False, 0, r'{}'),
    (r'true and 0', r'{}', False, 0, r'{}'),
    (r'5 == 5', r'{}', True, 0, r'{}'),
    (r'3 == 5', r'{}', False, 0, r'{}'),
    (r'"abc" == "abc"', r'{}', True, 0, r'{}'),
    (r'"abc" == "xyz"', r'{}', False, 0, r'{}'),
    (r'"abc" != "xyz"', r'{}', True, 0, r'{}'),
    (r'"abc" != "abc"', r'{}', False, 0, r'{}'),
    (r'true == true', r'{}', True, 0, r'{}'),
    (r'true != true', r'{}', False, 0, r'{}'),
    (r'true == false', r'{}', False, 0, r'{}'),
    (r'3.14 == 3.14', r'{}', True, 0, r'{}'),
    (r'3.14 == 42', r'{}', False, 0, r'{}'),
    (r'42 > 41', r'{}', True, 0, r'{}'),
    (r'42 >= 42', r'{}', True, 0, r'{}'),
    (r'41 >= 42', r'{}', False, 0, r'{}'),
    (r'13 < 42', r'{}', True, 0, r'{}'),
    (r'42 < 13', r'{}', False, 0, r'{}'),
    (r'!true', r'{}', False, 0, r'{}'),
    (r'-300 < 42', r'{}', True, 0, r'{}'),
    (r'true and !(5 == a)', r'{"a": 4}', True, 0, r'{"a": 4}'),
    (r'true and !(5 == a)', r'{"a": 5}', False, 0, r'{"a": 5}'),
    (r'(a.b == "hello") and (x.y > 3.14)', r'{"a":{"b":"hello"},"x":{"y":3.15}}', True, 0, r'{"a":{"b":"hello"},"x":{"y":3.15}}'),
    (r'(a.b == "hello") and (x.y > 3.14)', r'{"a":{"b":"hello"},"x":{"y":3.13}}', False, 0, r'{"a":{"b":"hello"},"x":{"y":3.13}}'),
    (r'(a.b == "hello") and (x.y > 3.14)', r'{"a":{"b":"mello"},"x":{"y":3.15}}', False, 0, r'{"a":{"b":"mello"},"x":{"y":3.15}}'),
    (r'brand.name == "Chevrolet"', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', True, 0, None),
    (r'brand.name != "Chevrolet"', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'brand.game == "Chevrolet"', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'brand.name == r"Chev.*"', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', True, 0, None),
    (r'brand.name != r"Chev.*"', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'brand.name == r"Bug.*"', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'brand.name != r"Bug.*"', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', True, 0, None),
    (r'request.path[1] == "v1"', r'{"request":{"path":["api","v1","example"]}}', True, 0, None),
    (r'request.path[1] != "v1"', r'{"request":{"path":["api","v1","example"]}}', False, 0, None),
    (r'request.headers["a"] == "b"', r'{"request":{"path":["api","v1","example"],"headers":{"a":"b","c":"d"}}}', True, 0, None),
    (r'request.headers["a"] != "b"', r'{"request":{"path":["api","v1","example"],"headers":{"a":"b","c":"d"}}}', False, 0, None),
    (r'request.headers["a"] == "d"', r'{"request":{"path":["api","v1","example"],"headers":{"a":"b","c":"d"}}}', False, 0, None),
    (r'request.headers["e"].x == "y"', r'{"request":{"path":["api","v1","example"],"headers":{"a":"b","c":"d","e":{"x":"y"}}}}', True, 0, None),
    (r'request.headers["e"].x == "z"', r'{"request":{"path":["api","v1","example"],"headers":{"a":"b","c":"d","e":{"x":"y"}}}}', False, 0, None),
    (r'request.headers["e"].x != "y"', r'{"request":{"path":["api","v1","example"],"headers":{"a":"b","c":"d","e":{"x":"y"}}}}', False, 0, None),
    (r'request.headers["e"].x != "z"', r'{"request":{"path":["api","v1","example"],"headers":{"a":"b","c":"d","e":{"x":"y"}}}}', True, 0, None),
    (r'brand.name.startsWith("Chev")', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', True, 0, None),
    (r'brand.name.startsWith("hev")', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'brand.name.endsWith("let")', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', True, 0, None),
    (r'brand.name.endsWith("le")', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'brand.name.contains("ro")', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', True, 0, None),
    (r'brand.name.contains("hello")', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'brand["name"].startsWith("Chev")', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', True, 0, None),
    (r'brand["name"].startsWithx("Chev")', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'brand["name"].startsWith("hev")', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'timestamp > datetime("10/19/2021, 6:29:02.000 PM")', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"timestamp":1634668524000}', True, 0, None),
    (r'timestamp > datetime("10/19/2021, 7:29:02.999 PM")', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"timestamp":1634668524000}', False, 0, None),
    (r'request.headers["a"] == "b" and request.path[1] == "v1"', r'{"request":{"path":["api","v1","example"],"headers":{"a":"b","c":"d"}}}', True, 0, None),
    (r'year == salesYear', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021,"salesYear":2021}', True, 0, None),
    (r'year == salesYear', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021,"salesYear":2020}', False, 0, None),
    (r'year != salesYear', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021,"salesYear":2020}', True, 0, None),
    (r'year != salesYear', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021,"salesYear":2021}', False, 0, None),
    (r'year > salesYear', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021,"salesYear":2020}', True, 0, None),
    (r'year > salesYear', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021,"salesYear":2022}', False, 0, None),
    (r'brand.name == "Chevrolet" and year == 2021', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', True, 0, None),
    (r'brand.name == "Chevrolet" and year == 2021', r'{"id":114905,"model":"Camaro","trend":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'year == 2021 and brand.name == "Chevrolet"', r'{"id":114905,"model":"Camaro","trend":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'model == nil', r'{"id":114905,"model":null,"brand":{"name":"Chevrolet"},"year":2021}', True, 0, None),
    (r'model != nil', r'{"id":114905,"model":null,"brand":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'model == nil', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'model != nil', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', True, 0, None),
    ('model == "\\"hello world\\";v=\\"42\\", "', r'{"brand":{"name":"Chevrolet"},"id":27502,"model":"\"hello world\";v=\"42\", ","year":2021}', True, 0, None),
    (r'brand.name == "Chevrolet" and limit(100)', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', True, 100, None),
    (r'limit(100) and brand.name == "Chevrolet"', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', True, 100, None),
    (r'brand.name != "Chevrolet" and limit(100)', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 100, None),
    (r'brand.name.startsWith()', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'brand.name.endsWith()', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'brand.name.contains()', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'datetime()', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"timestamp":1634668524000}', False, 0, None),
    (r'!brand.name.startsWith("Chev")', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, None),
    (r'!brand.name.startsWith("hev")', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', True, 0, None),
    (r'response.body.json().brand.name == "Chevrolet"', r'{"response":{"body":"{\"id\":114905,\"model\":\"Camaro\",\"brand\":{\"name\":\"Chevrolet\"},\"year\":2021}"}}', True, 0, None),
    (r'response.body.json().brand.name == "ChevroletX"', r'{"response":{"body":"{\"id\":114905,\"model\":\"Camaro\",\"brand\":{\"name\":\"Chevrolet\"},\"year\":2021}"}}', False, 0, None),
    (r'response.body.json().trend.name == "Chevrolet"', r'{"response":{"body":"{\"id\":114905,\"model\":\"Camaro\",\"brand\":{\"name\":\"Chevrolet\"},\"year\":2021}"}}', False, 0, None),
    (r'response.body.json().brand.name == "Chevrolet"', r'{"response":{"body":"INVALID JSON"}}', False, 0, None),
    (r'response.body.json() == "INVALID JSON"', r'{"response":{"body":"INVALID JSON"}}', False, 0, None),
    (r'response.body.json().key[0] == "api"', r'{"response":{"body":"{\"key\":[\"api\",\"v1\",\"example\"]}"}}', True, 0, None),
    (r'response.body.json()[0] == "api"', r'{"response":{"body":"[\"api\",\"v1\",\"example\"]"}}', True, 0, None),
    (r'response.body.json()[0] == "v1"', r'{"response":{"body":"[\"api\",\"v1\",\"example\"]"}}', False, 0, None),
    (r'response.body.json()["model"] == "Camaro"', r'{"response":{"body":"{\"id\":114905,\"model\":\"Camaro\",\"brand\":{\"name\":\"Chevrolet\"},\"year\":2021}"}}', True, 0, None),
    (r'response.body.json()["model"] == "CamaroX"', r'{"response":{"body":"{\"id\":114905,\"model\":\"Camaro\",\"brand\":{\"name\":\"Chevrolet\"},\"year\":2021}"}}', False, 0, None),
    (r'response.body.json().brand.name == "Chevrolet"', r'{"response":{"body":"eyJpZCI6MTE0OTA1LCJtb2RlbCI6IkNhbWFybyIsImJyYW5kIjp7Im5hbWUiOiJDaGV2cm9sZXQifSwieWVhciI6MjAyMX0="}}', True, 0, None),
    (r'response.body.json()..name == "Chevrolet"', r'{"response":{"body":"{\"id\":114905,\"model\":\"Camaro\",\"brand\":{\"name\":\"Chevrolet\"},\"year\":2021}"}}', True, 0, None),
    (r'response.body.json()..model == "Camaro"', r'{"response":{"body":"{\"id\":114905,\"model\":\"Camaro\",\"brand\":{\"name\":\"Chevrolet\"},\"year\":2021}"}}', True, 0, None),
    (r'response.body.json()..surname == "Chevrolet"', r'{"response":{"body":"{\"id\":114905,\"model\":\"Camaro\",\"brand\":{\"name\":\"Chevrolet\"},\"year\":2021}"}}', False, 0, None),
    (r'id == 114905 and redact("model", "brand.name")', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', True, 0, '{"id":114905,"model":"%s","brand":{"name":"%s"},"year":2021}' % (R, R)),
    (r'id == 114905 and redact("modelx", "brand.name")', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', True, 0, '{"id":114905,"model":"Camaro","brand":{"name":"%s"},"year":2021}' % R),
    (r'id == 114906 and redact("model", "brand.name")', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}'),
    (r'redact("model", "brand.name") and id == 114906', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, '{"id":114905,"model":"%s","brand":{"name":"%s"},"year":2021}' % (R, R)),
    (r'redact("model", "..name") and id == 114906', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, '{"id":114905,"model":"%s","brand":{"name":"%s"},"year":2021}' % (R, R)),
    (r'redact("model", "..name") and id == 114906', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021,"similar":{"id":114906,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}}', False, 0, '{"id":114905,"model":"%s","brand":{"name":"%s"},"year":2021,"similar":{"id":114906,"model":"Camaro","brand":{"name":"%s"},"year":2021}}' % (R, R, R)),
    (r'redact("..model", "..name") and id == 114906', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021,"similar":{"id":114906,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}}', False, 0, '{"id":114905,"model":"%s","brand":{"name":"%s"},"year":2021,"similar":{"id":114906,"model":"%s","brand":{"name":"%s"},"year":2021}}' % (R, R, R, R)),
    (r'redact("..model", "..surname") and id == 114906', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, '{"id":114905,"model":"%s","brand":{"name":"Chevrolet"},"year":2021}' % R),
    (r'redact("..surname") and id == 114906', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}'),
    (r'redact("model", "..name") and id == 114906', r'{"id":114905,"model":["Aamaro", "Bamaro", "Camaro"],"brand":{"name":"Chevrolet"},"year":2021}', False, 0, '{"id":114905,"model":"%s","brand":{"name":"%s"},"year":2021}' % (R, R)),
    (r'redact("model", "..name") and id == 114906', r'{"id":114905,"model":"Camaro","brand":{"name":["Ahevrolet", "Bhevrolet", "Chevrolet"]},"year":2021}', False, 0, '{"id":114905,"model":"%s","brand":{"name":"%s"},"year":2021}' % (R, R)),
    (r'redact("id", "brand.name") and id == 114905', r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False, 0, '{"id":"%s","model":"Camaro","brand":{"name":"%s"},"year":2021}' % (R, R)),
    (r'request.path.* == "v1"', r'{"request":{"path":["api","v1","example"]}}', True, 0, None),
    (r'request.path.* == "v2"', r'{"request":{"path":["api","v1","example"]}}', False, 0, None),
    (r'request.path.* != "v2"', r'{"request":{"path":["api","v1","example"]}}', True, 0, None),
    (r'request.path.* == "v2"', r'{"request":{"path":["api","v1","example"]}}', False, 0, None),
    (r'request.path.* > 2', r'{"request":{"path":[1, 2, 3]}}', True, 0, None),
    (r'request.path.* > 4', r'{"request":{"path":[1, 2, 3]}}', False, 0, None),
    (r'request.path.* < 2', r'{"request":{"path":[1, 2, 3]}}', True, 0, None),
    (r'request.path.* < 0', r'{"request":{"path":[1, 2, 3]}}', False, 0, None),
    (r'request.path.* >= 2', r'{"request":{"path":[1, 2, 3]}}', True, 0, None),
    (r'request.path.* >= 4', r'{"request":{"path":[1, 2, 3]}}', False, 0, None),
    (r'request.path.* <= 2', r'{"request":{"path":[1, 2, 3]}}', True, 0, None),
    (r'request.path.* <= 0', r'{"request":{"path":[1, 2, 3]}}', False, 0, None),
    (r'request.path.*.x > 2', r'{"request":{"path":[{"x":1}, {"x":2}, {"x":3}]}}', True, 0, None),
    (r'request.path.*.x > 4', r'{"request":{"path":[{"x":1}, {"x":2}, {"x":3}]}}', False, 0, None),
    (r'request.path.*.x and true', r'{"request":{"path":[{"x":1}, {"x":2}, {"x":3}]}}', True, 0, None),
    (r'request.path.*.x and true', r'{"request":{"path":[]}}', False, 0, None),
    (r'request.path.* == request.path.*', r'{"request":{"path":[1, 2, 3]}}', True, 0, None),
    (r'request.path.* != request.path.*', r'{"request":{"path":[1, 2, 3]}}', False, 0, None),
    (r'request.path.* > request.path.*', r'{"request":{"path":[1, 2, 3]}}', False, 0, None),
    (r'request.path.* > response.header.*', r'{"request":{"path":[1, 2, 3]},"response":{"header":[-1, -2, -3]}}', True, 0, None),
    (r'request.path.* < request.path.*', r'{"request":{"path":[1, 2, 3]}}', False, 0, None),
    (r'response.header.* < request.path.*', r'{"request":{"path":[1, 2, 3]},"response":{"header":[-1, -2, -3]}}', True, 0, None),
    (r'request.path.* >= request.path.*', r'{"request":{"path":[1, 2, 3]}}', False, 0, None),
    (r'request.path.* >= response.header.*', r'{"request":{"path":[1, 2, 3]},"response":{"header":[-1, -2, -3]}}', True, 0, None),
    (r'request.path.* <= request.path.*', r'{"request":{"path":[1, 2, 3]}}', False, 0, None),
    (r'response.header.* <= request.path.*', r'{"request":{"path":[1, 2, 3]},"response":{"header":[-1, -2, -3]}}', True, 0, None),
]

_BOOKSTORE_JSON = r'{"response":{"body":"<?xml version=\"1.0\" encoding=\"UTF-8\"?>\r\n<bookstore><book category=\"cooking\"><title lang=\"en\">Everyday Italian</title><author>Giada De Laurentiis</author><year>2005</year><price>30.00</price></book><book category=\"children\"><title lang=\"en\">Harry Potter</title><author>J K. Rowling</author><year>2005</year><price>29.99</price></book><book category=\"web\"><title lang=\"en\">XQuery Kick Start</title><author>James McGovern</author><author>Per Bothner</author><author>Kurt Cagle</author><author>James Linn</author><author>Vaidyanathan Nagarajan</author><year>2003</year><price>49.99</price></book><book category=\"web\"><title lang=\"en\">Learning XML</title><author>Erik T. Ray</author><year>2003</year><price>39.95</price></book></bookstore>\r\n"}}'

# (query, truth) against _BOOKSTORE_JSON — eval_test.go:186-219
XML_ROWS = [
    (r'response.body.xml().bookstore.book[1].title == "Harry Potter"', True),
    (r'response.body.xml().bookstore.book[1].title == "Lord of the Rings"', False),
]

BOOKSTORE_JSON = _BOOKSTORE_JSON

_CAR_BODY_JSON = r'{"response":{"body":"{\"id\":114905,\"model\":\"Camaro\",\"brand\":{\"name\":\"Chevrolet\"},\"year\":2021}"}}'
_CAR_BODY_B64 = r'{"response":{"body":"eyJpZCI6MTE0OTA1LCJtb2RlbCI6IkNhbWFybyIsImJyYW5kIjp7Im5hbWUiOiJDaGV2cm9sZXQifSwieWVhciI6MjAyMX0="}}'

# (query, truth, json, expected_nested, str_compare) — eval_test.go:221-237.
# expected_nested is compared against response.body of the result (after
# optional base64-decode of both sides).
REDACT_ROWS = [
    (r'redact("response.body.json().model")', True, _CAR_BODY_JSON, '{"id":114905,"model":"%s","brand":{"name":"Chevrolet"},"year":2021}' % R, False),
    (r'redact("response.body.json()..name")', True, _CAR_BODY_JSON, '{"id":114905,"model":"Camaro","brand":{"name":"%s"},"year":2021}' % R, False),
    (r'redact("response.body.json()...name")', True, _CAR_BODY_JSON, '{"id":114905,"model":"Camaro","brand":{"name":"%s"},"year":2021}' % R, False),
    (r'redact("response.body.json()..surname")', True, _CAR_BODY_JSON, r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False),
    (r'redact("response.body.json()...surname")', True, _CAR_BODY_JSON, r'{"id":114905,"model":"Camaro","brand":{"name":"Chevrolet"},"year":2021}', False),
    (r'redact("response.body.json().model")', True, _CAR_BODY_B64, "eyJpZCI6MTE0OTA1LCJtb2RlbCI6IltSRURBQ1RFRF0iLCJicmFuZCI6eyJuYW1lIjoiQ2hldnJvbGV0In0sInllYXIiOjIwMjF9", False),
    (
        r'redact("response.body.xml().bookstore.book[1].title")',
        True,
        _BOOKSTORE_JSON,
        '<?xml version="1.0" encoding="UTF-8"?>\n<bookstore><book category="cooking"><author>Giada De Laurentiis</author><price>30.00</price><title lang="en">Everyday Italian</title><year>2005</year></book><book category="children"><author>J K. Rowling</author><price>29.99</price><title>[REDACTED]</title><year>2005</year></book><book category="web"><author>James McGovern</author><author>Per Bothner</author><author>Kurt Cagle</author><author>James Linn</author><author>Vaidyanathan Nagarajan</author><price>49.99</price><title lang="en">XQuery Kick Start</title><year>2003</year></book><book category="web"><author>Erik T. Ray</author><price>39.95</price><title lang="en">Learning XML</title><year>2003</year></book></bookstore>',
        True,
    ),
]

# (query, truth) with timestamp = now - 2s — eval_test.go:288-348
TIME_ROWS = [
    (r'timestamp <= now()', True),
    (r'timestamp >= now()', False),
    (r'timestamp <= seconds(-5)', False),
    (r'timestamp >= seconds(-5)', True),
    (r'timestamp <= minutes(-5)', False),
    (r'timestamp >= minutes(-5)', True),
    (r'timestamp <= hours(-5)', False),
    (r'timestamp >= hours(-5)', True),
    (r'timestamp <= days(-5)', False),
    (r'timestamp >= days(-5)', True),
    (r'timestamp <= weeks(-5)', False),
    (r'timestamp >= weeks(-5)', True),
    (r'timestamp <= months(-5)', False),
    (r'timestamp >= months(-5)', True),
    (r'timestamp <= years(-5)', False),
    (r'timestamp >= years(-5)', True),
    (r'timestamp <= seconds(5)', True),
    (r'timestamp >= seconds(5)', False),
    (r'timestamp <= minutes(5)', True),
    (r'timestamp >= minutes(5)', False),
    (r'timestamp <= hours(5)', True),
    (r'timestamp >= hours(5)', False),
    (r'timestamp <= days(5)', True),
    (r'timestamp >= days(5)', False),
    (r'timestamp <= weeks(5)', True),
    (r'timestamp >= weeks(5)', False),
    (r'timestamp <= months(5)', True),
    (r'timestamp >= months(5)', False),
    (r'timestamp <= years(5)', True),
    (r'timestamp >= years(5)', False),
]

# (macros, query, expected) — macro_test.go:9-31 (verbatim golden)
MACRO_QUERY = """
http or !amqp and request.method == "GET" and request.headers["http"] == "x-amqp-y"

http or http2 or !amqp and request.method == "GET" and request.headers["http"] == "x-amqp-y"
\t"""
MACRO_EXPECTED = """
(proto.name == "http") or !(proto.name == "amqp") and request.method == "GET" and request.headers["http"] == "x-amqp-y"

(proto.name == "http") or (proto.name == "http2") or !(proto.name == "amqp") and request.method == "GET" and request.headers["http"] == "x-amqp-y"
\t"""
MACRO_DEFS = [
    ("http", 'proto.name == "http"'),
    ("http2", 'proto.name == "http2"'),
    ("amqp", 'proto.name == "amqp"'),
]
