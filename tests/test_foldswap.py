"""foldswap.tolerant_epoch_names unit semantics: the read-side view of a
fold commit from every static crash point. (The LM / lexical / corpus
suites cover the same protocol through their integrations; these pin the
helper's contract directly, fast.)"""

import json

import pytest

from substreams_sink_parquet_spark.foldswap import (
    FOLDED_EPOCH,
    MANIFEST,
    recover_fold,
    tolerant_epoch_names,
)
from substreams_sink_parquet_spark.fsio import HadoopFS


@pytest.fixture()
def fs(spark, tmp_path):
    return HadoopFS(spark, str(tmp_path))


def _mk(tmp_path, *names):
    for n in names:
        (tmp_path / n).mkdir(parents=True, exist_ok=True)


def _arm(tmp_path, srcs):
    (tmp_path / "_compact").mkdir(exist_ok=True)
    (tmp_path / "_compact" / MANIFEST).write_text(
        json.dumps({"sources": list(srcs)})
    )


def test_absent_root_and_plain_listing(fs, tmp_path):
    assert tolerant_epoch_names(fs, str(tmp_path / "nope")) == []
    _mk(tmp_path, "epoch=0", "epoch=1", "not_an_epoch")
    assert tolerant_epoch_names(fs, str(tmp_path)) == ["epoch=0", "epoch=1"]


def test_unarmed_tmp_ignored(fs, tmp_path):
    """No manifest: the fold never committed; its sources are intact and
    the half-written tmp must not be read (incomplete duplicate)."""
    _mk(tmp_path, "epoch=0", "epoch=1", "_compact")
    assert tolerant_epoch_names(fs, str(tmp_path)) == ["epoch=0", "epoch=1"]


def test_armed_tmp_replaces_named_sources(fs, tmp_path):
    """Crash after both source deletes, before the rename: the armed tmp
    is the only copy of the folded rows and stands in for its sources."""
    _mk(tmp_path, "epoch=2")  # trailing epoch, never folded
    _arm(tmp_path, ["epoch=0", "epoch=1"])
    assert tolerant_epoch_names(fs, str(tmp_path)) == [
        "epoch=2", "_compact"
    ]


def test_armed_tmp_excludes_surviving_sources(fs, tmp_path):
    """Crash after ONE of two source deletes: the survivor's rows are
    already summed into the fold — reading both would double-count."""
    _mk(tmp_path, "epoch=1", "epoch=2")
    _arm(tmp_path, ["epoch=0", "epoch=1"])
    assert tolerant_epoch_names(fs, str(tmp_path)) == [
        "epoch=2", "_compact"
    ]


def test_committed_fold_listed_plainly(fs, tmp_path):
    """After recover (or an uninterrupted commit) the destination is a
    normal epoch dir and no tmp handling applies."""
    _mk(tmp_path, "epoch=2")
    _arm(tmp_path, ["epoch=0", "epoch=1"])
    assert recover_fold(fs, str(tmp_path), "_compact") == "committed"
    assert tolerant_epoch_names(fs, str(tmp_path)) == [
        FOLDED_EPOCH, "epoch=2"
    ]


def test_torn_manifest_treated_as_unarmed(fs, tmp_path):
    """A manifest that fails to parse is a TORN WRITE: the manifest is
    written last and the commit (source deletes) only starts after it
    succeeds, so the sources are intact — readers list them and ignore
    the tmp (raising would wedge every read forever), and the writer's
    recover drops the uncommitted tmp exactly as if no manifest existed."""
    _mk(tmp_path, "epoch=0", "epoch=2")
    (tmp_path / "_compact").mkdir()
    (tmp_path / "_compact" / MANIFEST).write_text('{"sour')
    assert tolerant_epoch_names(fs, str(tmp_path)) == [
        "epoch=0", "epoch=2"
    ]
    assert recover_fold(fs, str(tmp_path), "_compact") == "dropped"
    assert not (tmp_path / "_compact").exists()
    assert tolerant_epoch_names(fs, str(tmp_path)) == [
        "epoch=0", "epoch=2"
    ]


def test_persistent_manifest_read_failure_raises_while_tmp_exists(
        fs, tmp_path):
    """When the manifest read keeps failing but the tmp dir is STILL
    THERE, the fold's state is unknowable — the reader must raise, not
    fall back to a bare listing that would silently drop an armed
    fold's rows (the race this helper exists to close)."""
    _mk(tmp_path, "epoch=2")
    _arm(tmp_path, ["epoch=0", "epoch=1"])

    class FlakyFS:
        def __init__(self, real):
            self._real = real

        def exists(self, url):
            return self._real.exists(url)

        def listdir(self, url):
            return self._real.listdir(url)

        def read_bytes(self, url):
            if url.endswith(MANIFEST):
                raise IOError("transient store failure")
            return self._real.read_bytes(url)

    with pytest.raises(IOError, match="unknowable"):
        tolerant_epoch_names(FlakyFS(fs), str(tmp_path))


def test_foldable_epoch_names_shared_rules(fs, tmp_path):
    """The writer-side foldable set: recover first, trailing numbered
    epoch excluded, None below min_epochs, epoch=-1 always foldable."""
    from substreams_sink_parquet_spark.foldswap import foldable_epoch_names

    assert foldable_epoch_names(fs, str(tmp_path / "nope"), 1) is None
    _mk(tmp_path, "epoch=-1", "epoch=0", "epoch=1", "epoch=2")
    assert foldable_epoch_names(fs, str(tmp_path), 2) == [
        "epoch=-1", "epoch=0", "epoch=1"
    ]
    assert foldable_epoch_names(fs, str(tmp_path), 4) is None
    # an armed crash is recovered (writer side) before listing
    _arm(tmp_path, ["epoch=0", "epoch=1"])
    import shutil

    shutil.rmtree(tmp_path / "epoch=0")
    shutil.rmtree(tmp_path / "epoch=1")
    got = foldable_epoch_names(fs, str(tmp_path), 1)
    # recover committed the fold: epoch=-1 holds it; trailing epoch=2 out
    assert got == ["epoch=-1"]
    assert not (tmp_path / "_compact").exists()


def test_fold_committing_between_snapshots_reads_consistently(
        fs, tmp_path, monkeypatch):
    """A fold that COMMITS between a reader's two snapshots (armed tmp
    seen first, committed epoch=-1 seen second) must produce the
    committed view on the retry, with real backoff between snapshot
    pairs — not a spurious raise after microseconds (VERDICT r10,
    Wrong #1: a merely SLOW live compactor is not a crashed one)."""
    from substreams_sink_parquet_spark import foldswap

    _mk(tmp_path, "epoch=2")
    _arm(tmp_path, ["epoch=0", "epoch=1"])

    sleeps = []
    monkeypatch.setattr(foldswap.time, "sleep", lambda s: sleeps.append(s))

    class CommitsMidRead:
        """Commits the fold right after the FIRST manifest read, so the
        reader's first snapshot pair disagrees (manifest bytes vs the
        post-commit listing) and the retry sees the committed state."""

        def __init__(self, real):
            self._real = real
            self._reads = 0

        def exists(self, url):
            return self._real.exists(url)

        def listdir(self, url):
            return self._real.listdir(url)

        def read_bytes(self, url):
            out = self._real.read_bytes(url)
            self._reads += 1
            if self._reads == 1:
                recover_fold(self._real, str(tmp_path), "_compact")
            return out

    got = tolerant_epoch_names(CommitsMidRead(fs), str(tmp_path))
    assert got == [FOLDED_EPOCH, "epoch=2"]
    assert sleeps, "the disagreeing snapshot pair must back off"


def test_no_sleep_on_happy_path(fs, tmp_path, monkeypatch):
    """Agreeing first snapshots — the overwhelmingly common case — must
    never pay the backoff."""
    from substreams_sink_parquet_spark import foldswap

    sleeps = []
    monkeypatch.setattr(foldswap.time, "sleep", lambda s: sleeps.append(s))
    _mk(tmp_path, "epoch=0", "epoch=1")
    assert tolerant_epoch_names(fs, str(tmp_path)) == ["epoch=0", "epoch=1"]
    _arm(tmp_path, ["epoch=0"])
    assert tolerant_epoch_names(fs, str(tmp_path)) == ["epoch=1", "_compact"]
    assert sleeps == []


def test_fold_committing_during_final_backoff_reads_fresh(
        fs, tmp_path, monkeypatch):
    """All three snapshot pairs disagree (a genuinely slow fold) and the
    commit lands during the LAST backoff sleep: the reader must take a
    FRESH snapshot after that sleep — the pre-sleep view names a
    _compact dir the commit just renamed away, and returning it would
    abort the caller's read on a missing path (the exact spurious
    failure the backoff exists to avoid)."""
    from substreams_sink_parquet_spark import foldswap

    _mk(tmp_path, "epoch=2")
    _arm(tmp_path, ["epoch=0", "epoch=1"])

    sleeps = []

    def _sleep(s):
        sleeps.append(s)
        if len(sleeps) == 3:  # the commit lands inside the final backoff
            recover_fold(fs, str(tmp_path), "_compact")

    monkeypatch.setattr(foldswap.time, "sleep", _sleep)

    class AlwaysDisagreeing:
        """Injects a phantom epoch on the first listdir of each of the
        three in-loop snapshot pairs, so every pair disagrees; the
        post-backoff fresh snapshot reads the truth."""

        def __init__(self, real):
            self._real = real
            self._n = 0

        def exists(self, url):
            return self._real.exists(url)

        def read_bytes(self, url):
            return self._real.read_bytes(url)

        def listdir(self, url):
            out = self._real.listdir(url)
            self._n += 1
            if self._n <= 6 and self._n % 2 == 1:
                return list(out) + ["epoch=phantom"]
            return out

    got = tolerant_epoch_names(AlwaysDisagreeing(fs), str(tmp_path))
    assert got == [FOLDED_EPOCH, "epoch=2"]
    assert len(sleeps) == 3
