package graft.api

import graft.api.ConfigInvalidation._
import org.scalatest.funsuite.AnyFunSuite

/** Trigger matrix ported from update-filter-function/test/index.spec.ts
  * (describe blocks :29-316, :319-616). */
class ConfigInvalidationSpec extends AnyFunSuite {

  test("MESSAGE_FORMAT: any write invalidates") {
    assert(decide(ChangeEvent("CONFIG", "MESSAGE_FORMAT", "INSERT")) == Invalidate)
    assert(decide(ChangeEvent("CONFIG", "MESSAGE_FORMAT", "MODIFY")) == Invalidate)
  }

  test("MACHINE_CONFIG: MODIFY invalidates, INSERT does not") {
    assert(decide(ChangeEvent("CONFIG", "MACHINE_CONFIG", "MODIFY")) == Invalidate)
    assert(decide(ChangeEvent("CONFIG", "MACHINE_CONFIG", "INSERT")) == Ignore)
    assert(decide(ChangeEvent("CONFIG", "MACHINE_CONFIG", "modify")) == Invalidate) // case-insensitive
  }

  test("UI reference mapping and name changes are metrics-only") {
    assert(decide(ChangeEvent("UI_REFERENCE", "UI_REFERENCE_MAPPING", "MODIFY")) == MetricsOnly)
    assert(decide(ChangeEvent("UI_REFERENCE", "MACHINE", "MODIFY",
      oldName = Some("a"), newName = Some("b"))) == MetricsOnly)
    // unchanged name: no-op
    assert(decide(ChangeEvent("UI_REFERENCE", "MACHINE", "MODIFY",
      oldName = Some("a"), newName = Some("a"))) == Ignore)
    // insert (no old image name): no-op
    assert(decide(ChangeEvent("UI_REFERENCE", "MACHINE", "INSERT",
      oldName = None, newName = Some("a"))) == Ignore)
  }

  test("records without a new image are ignored; batch folds to strongest") {
    assert(decide(ChangeEvent("CONFIG", "MESSAGE_FORMAT", "REMOVE", hasNewImage = false)) == Ignore)
    assert(decideBatch(Seq(
      ChangeEvent("UI_REFERENCE", "UI_REFERENCE_MAPPING", "MODIFY"),
      ChangeEvent("CONFIG", "MACHINE_CONFIG", "MODIFY"))) == Invalidate)
    assert(decideBatch(Seq.empty) == Ignore)
  }
}
