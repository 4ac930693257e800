"""Command-layer contract tests (reference: src/command/builder.rs).

Covers: verb dispatch incl. case-insensitivity (builder.rs:29), unknown-verb
error (builder.rs:77-80), TRUNCATEWAL's no-target default (builder.rs:41),
and each command's end-to-end execute().
"""

import numpy as np
import pytest

from vrod_tpu.commands import VERBS, CommandBuilder
from vrod_tpu.commands import types as T
from vrod_tpu.errors import MissingCommandArgError, UnrecognizedCommandError


@pytest.fixture
def builder(tmp_db):
    return CommandBuilder(tmp_db)


def test_all_verbs_dispatch(builder):
    expected = {
        "CREATE": T.CreateCollectionCommand,
        "DROP": T.DropCollectionCommand,
        "LISTCOLLECTIONS": T.ListCollectionsCommand,
        "TRUNCATEWAL": T.TruncateWalCommand,
        "INSERT": T.InsertCommand,
        "BULKINSERT": T.BulkInsertCommand,
        "UPDATE": T.UpdateCommand,
        "DELETE": T.DeleteCommand,
        "SEARCH": T.SearchCommand,
        "SEARCHSIMILAR": T.SearchSimilarCommand,
        "REINDEX": T.ReindexCommand,
    }
    assert set(VERBS) == set(expected)
    for verb, cls in expected.items():
        assert isinstance(builder.build(None, verb, None), cls)


def test_case_insensitive(builder):
    """builder.rs:29 upper-cases the verb before matching."""
    for verb in ("create", "Create", "CREATE", "sEaRcHsImIlAr"):
        cmd = builder.build(None, verb, None)
        assert isinstance(cmd, (T.CreateCollectionCommand, T.SearchSimilarCommand))


def test_unknown_verb(builder):
    with pytest.raises(UnrecognizedCommandError, match="Unrecognized command: FOO"):
        builder.build(None, "FOO", None)


def test_truncatewal_target_default(builder):
    """No -c target -> database-level WAL (builder.rs:41)."""
    cmd = builder.build(None, "TRUNCATEWAL", None)
    assert cmd.target is None
    cmd = builder.build("mycol", "TRUNCATEWAL", None)
    assert cmd.target == "mycol"


def test_create_drop_execute(builder):
    out = builder.build(None, "CREATE", "c1;dim=8;metric=l2;segment_rows=64").execute()
    assert "c1" in out and "l2" in out
    out = builder.build(None, "LISTCOLLECTIONS", None).execute()
    assert "c1" in out
    out = builder.build(None, "DROP", "c1").execute()
    assert "Dropped" in out


def test_insert_search_flow(builder, tmp_db):
    builder.build(None, "CREATE", "c;dim=4;segment_rows=64").execute()
    out = builder.build("c", "INSERT", "1,0,0,0;first").execute()
    assert "1" in out
    builder.build("c", "INSERT", "0,1,0,0;second").execute()
    out = builder.build("c", "SEARCHSIMILAR", "1,0,0,0;k=1").execute()
    assert "first" in out
    out = builder.build("c", "SEARCH", "2").execute()
    assert out.endswith(";second")
    builder.build("c", "UPDATE", "2;0,0,1,0;second-v2").execute()
    out = builder.build("c", "SEARCH", "2").execute()
    assert out.endswith(";second-v2")
    builder.build("c", "DELETE", "1").execute()
    out = builder.build("c", "SEARCHSIMILAR", "1,0,0,0;k=5").execute()
    assert "first" not in out
    out = builder.build("c", "REINDEX", None).execute()
    assert "Reindexed" in out


def test_bulkinsert_from_file(builder, tmp_path):
    builder.build(None, "CREATE", "c;dim=3;segment_rows=64").execute()
    f = tmp_path / "recs.txt"
    f.write_text("1,0,0;a\n0,1,0;b\n0,0,1;c\n")
    out = builder.build("c", "BULKINSERT", str(f)).execute()
    assert "3 records" in out


def test_missing_args(builder):
    builder.build(None, "CREATE", "c;dim=4;segment_rows=64").execute()
    for verb in ("INSERT", "UPDATE", "DELETE", "SEARCH", "SEARCHSIMILAR"):
        with pytest.raises(MissingCommandArgError):
            builder.build(None, verb, "1,0,0,0").execute()  # no collection
    with pytest.raises(MissingCommandArgError):
        builder.build("c", "INSERT", None).execute()  # no arg
    with pytest.raises(MissingCommandArgError):
        builder.build(None, "CREATE", None).execute()


def test_unrecognized_command_object(tmp_db):
    out = T.UnrecognizedCommand(tmp_db).execute()
    assert "no-op" in out


def test_create_bad_int_option_is_clean_error(tmp_db):
    from vrod_tpu.commands.builder import CommandBuilder
    from vrod_tpu.errors import RecordFormatError
    import pytest
    cb = CommandBuilder(tmp_db)
    with pytest.raises(RecordFormatError, match="dim=.*integer"):
        cb.build(None, "CREATE", "c;dim=abc").execute()


def test_delete_negative_id_clean_error(tmp_db):
    from vrod_tpu.commands.builder import CommandBuilder
    from vrod_tpu.errors import RecordFormatError
    import pytest
    tmp_db.create_collection("neg", dim=4, segment_rows=64)
    cb = CommandBuilder(tmp_db)
    with pytest.raises(RecordFormatError, match="non-negative"):
        cb.build("neg", "DELETE", "-5,3").execute()
