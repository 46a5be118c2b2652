from __future__ import annotations

import json
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server(spark, sf_dir):
    from mldb_spark.api import Mldb
    from mldb_spark.catalog import load
    from mldb_spark.rest import MldbRestServer

    mldb = Mldb(spark)
    mldb.create_dataset("region", load(spark, sf_dir, "region"))
    mldb.create_dataset("nation", load(spark, sf_dir, "nation"))
    srv = MldbRestServer(mldb).start()
    yield srv
    srv.stop()


def _get(server, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}{path}") as r:
        return r.status, json.loads(r.read())


def _req(server, method, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=json.dumps(body).encode(),
        method=method,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def test_query_formats(server):
    q = "SELECT r_name FROM region ORDER BY r_name LIMIT 2"
    _, full = _get(server, f"/v1/query?q={q.replace(' ', '%20')}")
    assert full[0]["columns"] == [["r_name", "AFRICA", None]]

    _, aos = _get(server, f"/v1/query?q={q.replace(' ', '%20')}&format=aos")
    assert aos == [{"r_name": "AFRICA"}, {"r_name": "AMERICA"}]

    _, soa = _get(server, f"/v1/query?q={q.replace(' ', '%20')}&format=soa")
    assert soa == {"r_name": ["AFRICA", "AMERICA"]}

    _, table = _get(server, f"/v1/query?q={q.replace(' ', '%20')}&format=table")
    assert table == [["r_name"], ["AFRICA"], ["AMERICA"]]

    _, nohdr = _get(
        server, f"/v1/query?q={q.replace(' ', '%20')}&format=table&headers=0"
    )
    assert nohdr == [["AFRICA"], ["AMERICA"]]


def test_dataset_routes(server):
    _, names = _get(server, "/v1/datasets")
    assert "region" in names and "nation" in names
    _, status = _get(server, "/v1/datasets/region")
    assert status["rowCount"] == 5 and "r_name" in status["columns"]
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/v1/datasets/nope")
    assert e.value.code == 404


def test_create_entities_over_rest(server, sf_dir):
    st, out = _req(
        server,
        "PUT",
        "/v1/datasets/part2",
        {"type": "tabular", "params": {"dataFileUrl": f"{sf_dir}/part.parquet"}},
    )
    assert st == 201 and out["kind"] == "dataset"
    _, names = _get(server, "/v1/datasets")
    assert "part2" in names

    st, _ = _req(
        server,
        "POST",
        "/v1/procedures",
        {
            "type": "transform",
            "id": "t1",
            "params": {
                "inputData": "SELECT count(*) AS n FROM nation",
                "outputDataset": "nation_count",
            },
        },
    )
    assert st == 201
    _, res = _get(server, "/v1/query?q=SELECT%20n%20FROM%20nation_count&format=aos")
    assert res == [{"n": 25}]

    st, _ = _req(
        server,
        "PUT",
        "/v1/functions/shout",
        {"type": "sql.expression", "params": {"expression": "upper(r_name) AS u"}},
    )
    assert st == 201
    _, fns = _get(server, "/v1/functions")
    assert "shout" in fns


def test_query_errors(server):
    # unknown dataset -> 404 (entity-not-found, like the reference's
    # collection lookups); malformed SQL -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/v1/query?q=SELECT%20*%20FROM%20missing_table")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/v1/query?q=SELECT%20FROM%20WHERE")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/v1/query")  # missing q
    assert e.value.code == 400


def test_query_in_post_body(server):
    """MLDB-1717_query_select_in_body.py: query parameters may arrive
    in the request body instead of the query string."""
    st, out = _req(
        server,
        "POST",
        "/v1/query",
        {"q": "SELECT r_name FROM region ORDER BY r_name LIMIT 1", "format": "aos"},
    )
    assert st == 200 and out == [{"r_name": "AFRICA"}]


def test_sparse_and_atom_formats(server):
    q = "SELECT r_name FROM region ORDER BY r_name LIMIT 2"
    _, sparse = _get(server, f"/v1/query?q={q.replace(' ', '%20')}&format=sparse")
    assert sparse == [[["r_name", "AFRICA"]], [["r_name", "AMERICA"]]]

    one = "SELECT count(*) AS n FROM region"
    _, atom = _get(server, f"/v1/query?q={one.replace(' ', '%20')}&format=atom")
    assert atom == 5

    # atom rejects multi-row / multi-column results (dataset_collection.cc:238)
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, f"/v1/query?q={q.replace(' ', '%20')}&format=atom")
    assert e.value.code == 400


def test_function_application_route(spark):
    """MLDB-1705/2163: GET and POST
    /v1/functions/<name>/application apply a registered function to
    one JSON input row and return its outputs."""
    import json
    import urllib.request

    from mldb_spark.api import Mldb
    from mldb_spark.rest import MldbRestServer

    m = Mldb(spark)
    m.create_sql_expression_function("addup", "a + b as rez")
    srv = MldbRestServer(m).start()
    try:
        q = urllib.parse.quote(json.dumps({"a": 1, "b": 2}))
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/v1/functions/addup/application?input={q}"
        ) as r:
            out = json.loads(r.read())
        assert out["output"]["rez"] == 3
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/v1/functions/addup/application",
            data=json.dumps({"input": {"a": 5, "b": 7}}).encode(),
            method="POST",
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["output"]["rez"] == 12
    finally:
        srv.stop()


def test_mldb_2107_atom_format_battery(server):
    """MLDB-2107-scalar-format.py: the atom format returns the bare
    scalar for every type, and errors on multiple columns, multiple
    rows, no rows, and no columns."""
    import urllib.error
    import urllib.parse

    def atom(q):
        qs = urllib.parse.quote(q)
        return _get(server, f"/v1/query?q={qs}&format=atom")[1]

    def atom_error(q):
        qs = urllib.parse.quote(q)
        try:
            _get(server, f"/v1/query?q={qs}&format=atom")
        except urllib.error.HTTPError as e:
            return json.loads(e.read()).get("error", "")
        raise AssertionError("expected an atom-format error")

    assert atom("select x from (select 17 as x)") == 17
    assert atom("select x from (select 2.3 as x)") == 2.3
    assert atom("select x from (select 'blah' as x)") == "blah"
    assert atom("select x from (select false as x)") in (False, 0)
    assert "column" in atom_error(
        "select x, y from (select false as x, 1 as y)"
    ).lower()
    assert "row" in atom_error("select r_name from region").lower()
    assert atom("select r_name from region order by r_name limit 1") == "AFRICA"
    assert "row" in atom_error(
        "select r_name from region where r_name = 'patate'"
    ).lower()


def test_mldb_951_run_on_creation_lifecycle(server):
    """MLDB-951-run-on-creation.py: PUT /v1/procedures/<id> with
    runOnCreation=False stores without running (no status); POST
    .../runs executes it; runOnCreation=True reports a firstRun."""
    import urllib.parse

    # source table registered in the fixture: region
    st, body = _req(server, "PUT", "/v1/procedures/t951", {
        "type": "transform",
        "params": {
            "inputData": "select r_regionkey + 1 as k from region",
            "outputDataset": {"id": "t951_out", "type": "sparse.mutable"},
            "runOnCreation": False,
        },
    })
    assert st == 201 and "status" not in body
    # dataset must not exist yet
    qs = urllib.parse.quote("select k from t951_out")
    try:
        _get(server, f"/v1/query?q={qs}")
        raise AssertionError("t951_out must not exist before the run")
    except Exception:
        pass
    st, _body = _req(server, "POST", "/v1/procedures/t951/runs", {})
    assert st == 201
    _, rows = _get(server, f"/v1/query?q={qs}&format=aos")
    assert sorted(r["k"] for r in rows) == [1, 2, 3, 4, 5]
    # runOnCreation True reports firstRun
    st, body = _req(server, "PUT", "/v1/procedures/t951b", {
        "type": "transform",
        "params": {
            "inputData": "select r_regionkey as k from region",
            "outputDataset": "t951b_out",
            "runOnCreation": True,
        },
    })
    assert st == 201 and "firstRun" in body.get("status", {})


def test_mldbfb_208_run_params_override(server):
    """MLDBFB-208_procedure_params_overwrite_test.py: a run's params
    override the stored procedure config per key."""
    st, _b = _req(server, "PUT", "/v1/procedures/t208", {
        "type": "transform",
        "params": {
            "inputData": "select r_regionkey as k from doesnotexist",
            "outputDataset": "t208_bad",
            "runOnCreation": False,
        },
    })
    assert st == 201
    st, _b = _req(server, "POST", "/v1/procedures/t208/runs", {
        "params": {
            "inputData": "select r_regionkey as k from region",
            "outputDataset": "t208_out",
        },
    })
    assert st == 201
    import urllib.parse

    qs = urllib.parse.quote("select k from t208_out order by k")
    _, rows = _get(server, f"/v1/query?q={qs}&format=aos")
    assert [r["k"] for r in rows] == [0, 1, 2, 3, 4]


def test_mldb_1359_latest_run(server):
    """MLDB-1359_procedure_latest_run.py: /latestrun reports the most
    recent run's metadata, advancing across runs."""
    import time

    _req(server, "PUT", "/v1/procedures/t1359", {
        "type": "transform",
        "params": {
            "inputData": "select r_name from region",
            "outputDataset": "t1359_out",
            "runOnCreation": True,
        },
    })
    st, first = _get(server, "/v1/procedures/t1359/latestrun")
    assert st == 200 and first["state"] == "finished"
    time.sleep(0.02)
    _req(server, "POST", "/v1/procedures/t1359/runs", {})
    _, second = _get(server, "/v1/procedures/t1359/latestrun")
    assert second["runStarted"] > first["runStarted"]


def test_mldb_2112_broken_procedure_is_400_not_500(server):
    """MLDB-2112_500_on_broken_proc_test.py: a procedure whose query
    is invalid errors cleanly (4xx with an error body), never a
    crash/500."""
    import urllib.error

    try:
        _req(server, "PUT", "/v1/procedures/broken2112", {
            "type": "transform",
            "params": {
                "inputData": "SELECT x:BUG:1",
                "outputDataset": "perruche",
                "runOnCreation": True,
            },
        })
        raise AssertionError("expected an error response")
    except urllib.error.HTTPError as e:
        assert 400 <= e.code < 500
        body = json.loads(e.read())
        assert "error" in body


def test_mldb_1717_redirect_get(server):
    """MLDB-1717_query_select_in_body.py (test_as_POST_body):
    POST /v1/redirect/get {target: /v1/query, body: {q}} re-dispatches
    the query; a non-query target is a clean 400."""
    status, rows = _req(
        server, "POST", "/v1/redirect/get",
        {"target": "/v1/query",
         "body": {"q": "SELECT r_name FROM region ORDER BY r_name LIMIT 1"}},
    )
    assert status == 200
    assert rows[0]["columns"][0][1] == "AFRICA"
    import urllib.error

    import pytest

    with pytest.raises(urllib.error.HTTPError) as ei:
        _req(server, "POST", "/v1/redirect/get", {"target": "/v1/datasets"})
    assert ei.value.code == 400


def test_mldb_1260_uniform_error_format(server):
    """MLDB-1260-json-errors.py: every error response is shaped the
    same — an 'error' message AND an 'httpCode' field — for parse
    errors, unknown functions, and unknown routes."""
    import urllib.error
    import urllib.parse

    for path in (
        "/v1/query?q=sele",
        "/v1/query?q=" + urllib.parse.quote("select h()"),
        "/v1/querry",
    ):
        try:
            _get(server, path)
            raise AssertionError(f"{path} should have errored")
        except urllib.error.HTTPError as e:
            body = json.loads(e.read())
            assert "error" in body, (path, body)
            assert body.get("httpCode") == e.code, (path, body)


def test_mldb_1010_empty_payload(server):
    """MLDB-1010-put-no-payload-error.js: PUT/POST with an empty body
    is a clean 400 saying 'empty payload'."""
    import urllib.error

    for method, path in (
        ("PUT", "/v1/procedures/test1010"),
        ("POST", "/v1/procedures"),
        ("PUT", "/v1/datasets/test1010"),
    ):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}{path}",
            data=b"", method=method,
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req)
            raise AssertionError(f"{method} {path} should have errored")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            body = json.loads(e.read())
            assert "empty payload" in body["error"]


def test_mldb_2163_redirect_function_application(spark):
    """MLDB-2163-POST-function-application.py (test_as_POST_body):
    /v1/redirect/get dispatches a function application whose input
    rides in the body."""
    from mldb_spark.api import Mldb
    from mldb_spark.rest import MldbRestServer

    m = Mldb(spark)
    m.create_sql_expression_function("addup2163", "a + b as rez")
    srv = MldbRestServer(m).start()
    try:
        status, out = _req(
            srv, "POST", "/v1/redirect/get",
            {
                "target": "/v1/functions/addup2163/application",
                "body": {"input": {"a": 5, "b": 7}},
            },
        )
        assert status == 200
        assert out["output"]["rez"] == 12
    finally:
        srv.stop()


def test_mldb_255_python_script_route(server):
    """MLDB-255-type-routes.js (python flavor; the javascript flavor
    is the declared-out-of-scope JS engine): POST .../python/routes/
    run executes a source — expression results return directly,
    request.set_return() carries statement-script results, and syntax
    or runtime errors are clean 400s."""
    import urllib.error

    status, out = _req(
        server, "POST", "/v1/types/plugins/python/routes/run",
        {"source": "'hello, world from python expr'"},
    )
    assert status == 200 and out["result"] == "hello, world from python expr"
    status, out = _req(
        server, "POST", "/v1/types/plugins/python/routes/run",
        {"source": "request.set_return('hello, world from python')"},
    )
    assert status == 200 and out["result"] == "hello, world from python"
    for bad in ("this has a syntax error", "this_has_a_runtime_error()"):
        try:
            _req(server, "POST", "/v1/types/plugins/python/routes/run",
                 {"source": bad})
            raise AssertionError("should have errored")
        except urllib.error.HTTPError as e:
            assert e.code == 400


def test_mldb_348_326_983_put_post_ids(spark):
    """MLDB-348-put-post-id.js + MLDB-326-put-post-training-ids.js +
    MLDB-983-create-dataset-ids.js: PUT with a contradicting body id
    is 400; POST without an id auto-generates an auto_-prefixed one;
    run PUTs need a run name; named-run PUT works; run-config id
    mismatch is 400."""
    import urllib.error

    from mldb_spark.api import Mldb
    from mldb_spark.rest import MldbRestServer

    m = Mldb(spark)
    srv = MldbRestServer(m).start()

    def expect(code, method, path, body):
        try:
            return _req(srv, method, path, body)
        except urllib.error.HTTPError as e:
            assert e.code == code, (method, path, e.code)
            return None

    try:
        # dataset PUT/POST id rules
        status, _ = _req(srv, "PUT", "/v1/datasets/test5",
                         {"type": "sparse.mutable"})
        assert status == 201
        expect(400, "PUT", "/v1/datasets/test2",
               {"id": "test1", "type": "sparse.mutable"})
        status, out = _req(srv, "POST", "/v1/datasets",
                           {"type": "sparse.mutable"})
        assert status == 201
        assert out["config"]["id"].startswith("auto_")
        status, _ = _req(srv, "POST", "/v1/datasets",
                         {"id": "test3", "type": "sparse.mutable"})
        assert status == 201
        # run lifecycle (null procedure)
        status, _ = _req(srv, "PUT", "/v1/procedures/nullproc",
                         {"type": "null"})
        assert status == 201
        expect(404, "PUT", "/v1/procedures/nullproc/runs", {})
        status, _ = _req(srv, "PUT", "/v1/procedures/nullproc/runs/test5", {})
        assert status == 201
        expect(400, "PUT", "/v1/procedures/nullproc/runs/test2",
               {"id": "test1"})
        status, _ = _req(srv, "POST", "/v1/procedures/nullproc/runs", {})
        assert status == 201
    finally:
        srv.stop()


def test_mutable_dataset_record_commit(spark):
    """The reference's create/record/commit lifecycle over REST
    (MLDB-1267's setup shape; MLDB-460's empty-name errors): rows
    recorded cell-by-cell become a queryable CELLS dataset at commit,
    with GET_LATEST semantics and per-cell timestamps."""
    import urllib.error

    from mldb_spark.api import Mldb
    from mldb_spark.rest import MldbRestServer

    m = Mldb(spark)
    srv = MldbRestServer(m).start()
    try:
        _req(srv, "PUT", "/v1/datasets/input", {"type": "sparse.mutable"})
        _req(srv, "POST", "/v1/datasets/input/rows",
             {"rowName": "row1", "columns": [["score", 5, 6]]})
        _req(srv, "POST", "/v1/datasets/input/rows",
             {"rowName": "row2", "columns": [["score", 1, 5]]})
        try:
            _req(srv, "POST", "/v1/datasets/input/rows",
                 {"rowName": "", "columns": [["score", 1, 5]]})
            raise AssertionError("empty row name should 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        _req(srv, "POST", "/v1/datasets/input/commit", {})
        out = m.query(
            "SELECT score, latest_timestamp({*}) AS ts FROM input "
            "ORDER BY rowName()"
        ).collect()
        assert [r["score"] for r in out] == [5.0, 1.0]
        assert out[0]["ts"].isoformat().startswith("1970-01-01T00:00:06")
    finally:
        srv.stop()


def test_mldb_1869_payloads_with_trailing_newlines(spark):
    """MLDB-1869_json_payload_test.py: JSON bodies terminated with
    \\n or \\r\\n (and multi-line bodies) parse fine on PUT."""
    import urllib.request

    from mldb_spark.api import Mldb
    from mldb_spark.rest import MldbRestServer

    m = Mldb(spark)
    srv = MldbRestServer(m).start()
    try:
        for did, raw in (
            ("ds1869a", b'{"type" : "sparse.mutable"}'),
            ("ds1869b", b'{"type" : "sparse.mutable"}\n'),
            ("ds1869c", b'{\n"type" : "sparse.mutable"\n}\n'),
            ("ds1869d", b'{"type" : "sparse.mutable"}\r\n'),
            ("ds1869e", b'{\r\n"type" : "sparse.mutable"\r\n}\r\n'),
        ):
            req = urllib.request.Request(
                f"http://127.0.0.1:{srv.port}/v1/datasets/{did}",
                data=raw, method="PUT",
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                assert 200 <= r.status < 400
    finally:
        srv.stop()


def test_mldb_153_script_runs_are_isolated(server):
    """MLDB-153_pyscript_state_pollution.py: state set by one script
    run does not leak into the next — `a=1` then `print(a)` is a
    NameError 400 mentioning name 'a'."""
    import urllib.error

    status, _ = _req(
        server, "POST", "/v1/types/plugins/python/routes/run",
        {"source": "a=1"},
    )
    assert status == 200
    try:
        _req(server, "POST", "/v1/types/plugins/python/routes/run",
             {"source": "print(a)"})
        raise AssertionError("state leaked between script runs")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        import json as _json

        body = _json.loads(e.read())
        assert "'a'" in str(body)


def test_mldb_605_full_format_returns_all_cell_tuples(spark):
    """MLDB-679-latest-get-variable.js (the MLDB-605 case, per the
    MLDB-1370 consistency note): the FULL query format over a cells
    dataset returns ALL timestamped tuples of a cell — x recorded at
    3 timestamps renders a 3-tuple columns list, for both SELECT *
    and SELECT x; the table format keeps GET_LATEST."""
    from mldb_spark.api import Mldb
    from mldb_spark.rest import MldbRestServer

    m = Mldb(spark)
    m.create_entity("dataset", {"type": "sparse.mutable", "id": "m605"})
    m.record_rows("m605", [{
        "rowName": "row1",
        "columns": [["x", 0, "2015-01-01T00:00:00Z"],
                    ["x", 1, "2015-01-02T00:00:00Z"],
                    ["x", 2, "2015-01-03T00:00:00Z"]],
    }])
    m.commit_dataset("m605")
    srv = MldbRestServer(m).start()
    try:
        import urllib.parse

        q = urllib.parse.quote("SELECT * from m605")
        _, rows = _get(srv, f"/v1/query?q={q}")
        assert len(rows) == 1 and len(rows[0]["columns"]) == 3
        assert [c[0] for c in rows[0]["columns"]] == ["x", "x", "x"]
        assert [c[1] for c in rows[0]["columns"]] == [0.0, 1.0, 2.0]
        q = urllib.parse.quote("SELECT x from m605")
        _, rows = _get(srv, f"/v1/query?q={q}")
        assert len(rows[0]["columns"]) == 3
        # table format stays GET_LATEST
        q = urllib.parse.quote("SELECT x from m605")
        _, tbl = _get(srv, f"/v1/query?q={q}&format=table")
        assert tbl[-1][-1] == 2.0
    finally:
        srv.stop()


def test_mldb_2112_broken_proc_is_4xx_not_500(server):
    """MLDB-2112_500_on_broken_proc_test.py: PUT of a procedure whose
    run fails (bogus SQL) returns a CLEAN 4xx with the uniform error
    body — never a 500/crash — the stored config stays GETtable, and
    /runs on a never-run procedure is 404."""
    import urllib.error

    try:
        _req(server, "PUT", "/v1/procedures/m2112", {
            "type": "transform",
            "params": {
                "inputData": "SELECT x:BUG:1",
                "outputDataset": "m2112_out",
                "runOnCreation": True,
            },
        })
        raise AssertionError("broken procedure run should have errored")
    except urllib.error.HTTPError as e:
        assert 400 <= e.code < 500, e.code
        body = json.loads(e.read())
        assert "error" in body
    # the stored config survives the failed run
    st, cfg = _get(server, "/v1/procedures/m2112")
    assert st == 200
    # /runs of a procedure that never completed a run is 404
    try:
        _get(server, "/v1/procedures/m2112/latestrun")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_mldb_444_plugin_routes_mirror(server):
    """MLDB-444_python_perform_default_args.py: a python plugin with
    a custom routes source mirrors request.rest_params and
    request.payload back — defaulted args arrive empty, URL params
    arrive as [k, v] pairs, the JSON body arrives parsed. (+
    MLDB-2114: a route on an UNKNOWN plugin is a clean 404.)"""
    st, _ = _req(server, "PUT", "/v1/plugins/mirror444", {
        "type": "python",
        "params": {
            "source": {
                "routes": (
                    "request.set_return({'args': request.rest_params,"
                    " 'payload': request.payload})"
                ),
            },
        },
    })
    assert st == 201
    st, out = _req(server, "POST", "/v1/plugins/mirror444/routes/pwet", {})
    assert st == 200
    assert out["args"] == [] and out["payload"] == {}
    st, out = _req(
        server, "POST", "/v1/plugins/mirror444/routes/pwet?patate=5",
        {"ataboy": 5},
    )
    assert st == 200
    assert out["args"] == [["patate", "5"]]
    assert out["payload"] == {"ataboy": 5}
    import urllib.error

    try:
        _req(server, "POST", "/v1/plugins/nope/routes/pwet", {})
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_mldb_951_post_run_location_header(server):
    """MLDB-951-run-on-creation.py (+ MLDB-299/305 sync flavor): POST
    …/runs answers 201 with a Location header pointing at the created
    run, and GETting it works."""
    _req(server, "PUT", "/v1/procedures/m951rest", {
        "type": "transform",
        "params": {
            "inputData": "select 1 as x from region",
            "outputDataset": "m951rest_out",
            "runOnCreation": False,
        },
    })
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/procedures/m951rest/runs",
        data=b"{}",
        method="POST",
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.status == 201
        loc = r.headers["Location"]
    assert loc == "/v1/procedures/m951rest/latestrun"
    st, run = _get(server, loc)
    assert st == 200 and run["state"] == "finished"


def test_mldb_1040_invalid_requests(server):
    """MLDB-1040-invalid-requests.cc (REST flavor): unknown routes
    404 with the uniform error body; malformed JSON payloads are a
    clean 400 — never a hang or crash."""
    import urllib.error

    for path in ("/v1/nope", "/v1/datasets/does_not_exist_1040",
                 "/totally/bogus"):
        try:
            _get(server, path)
            raise AssertionError(f"expected error for {path}")
        except urllib.error.HTTPError as e:
            assert e.code in (400, 404), (path, e.code)
            body = json.loads(e.read())
            assert "error" in body and "httpCode" in body
    # malformed JSON body
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/procedures/bad1040",
        data=b"{not json",
        method="PUT",
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
