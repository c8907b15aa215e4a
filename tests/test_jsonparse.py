from engine.core.jsonparse import extract_json


def test_passthrough_and_message_paths():
    doc = {"schema_version": "1.3.1", "doc": {}, "passages": [],
           "entities": [], "data": {}}
    assert extract_json(doc) is doc
    assert extract_json({"choices": [{"message": {"parsed": {"a": 1}}}]}) == {"a": 1}
    assert extract_json({"choices": [{"message": {"tool_calls": [
        {"function": {"arguments": '{"b": 2}'}}]}}]}) == {"b": 2}
    assert extract_json({"choices": [{"message": {"content": [
        {"type": "text", "text": '{"c": 3}'}]}}]}) == {"c": 3}


def test_text_fallbacks():
    assert extract_json('{"x": 1}') == {"x": 1}
    assert extract_json('```json\n{"x": 2}\n```') == {"x": 2}
    assert extract_json('noise ```json {"x": 3}``` more') == {"x": 3}
    assert extract_json('prefix {"nested": {"y": 4}} suffix') == {"nested": {"y": 4}}
    assert extract_json("no json here") == {}
    assert extract_json(None) == {}
    assert extract_json(["junk", '{"z": 5}']) == {"z": 5}


def test_unbalanced_braces():
    assert extract_json("{ broken { json") == {}
    assert extract_json('bad {"a": } then {"b": 1}') == {"b": 1}


def test_non_object_json_rejected():
    # contract: only objects come back; scalars/arrays in text are not docs
    assert extract_json("42") == {}
    assert extract_json("null") == {}
    assert extract_json("[1, 2]") == {}
    assert extract_json('```json\n[1]\n```') == {}


def test_stray_close_brace_before_object():
    # deviation: the reference's scan goes depth-negative and loses the object
    assert extract_json('} then {"a": 1}') == {"a": 1}
