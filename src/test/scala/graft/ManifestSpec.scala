package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Manifest

/** The cross-store manifest's mechanics (q152 gates the end-to-end
  * snapshot-isolation story over real stores; these pin the pointer/
  * CAS/retention file semantics, driver-side only).
  */
class ManifestSpec extends AnyFunSuite {

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"graft-manifest-$tag").toString + "/m"

  test("init/publish/resolve: CAS semantics and sorted round-trip") {
    val root = fresh("cas")
    Manifest.init(root, Map("index" -> 1L, "vectors" -> 1L))
    assert(Manifest.currentVersion(root) === 1L)
    assert(Manifest.pinsCurrent(root) === Map("index" -> 1L, "vectors" -> 1L))
    // stale CAS no-ops and leaves no directory behind
    assert(Manifest.publish(root, expectedVersion = 7L, Map("index" -> 9L)) === 1L)
    assert(!Files.exists(java.nio.file.Paths.get(root, "v2")))
    // real publish; a retry against the consumed version no-ops
    assert(Manifest.publish(root, 1L, Map("index" -> 2L, "vectors" -> 1L)) === 2L)
    assert(Manifest.publish(root, 1L, Map("index" -> 99L)) === 2L)
    assert(Manifest.pins(root, 2L) === Map("index" -> 2L, "vectors" -> 1L))
    // historical versions stay resolvable until vacuumed
    assert(Manifest.pins(root, 1L) === Map("index" -> 1L, "vectors" -> 1L))
    assert(Manifest.resolve(root, 2L, "index") === 2L)
  }

  test("invalid pins are refused eagerly") {
    val root = fresh("valid")
    assertThrows[IllegalArgumentException] { Manifest.init(root, Map.empty) }
    assertThrows[IllegalArgumentException] {
      Manifest.init(root, Map("a=b" -> 1L))
    }
    Manifest.init(root, Map("ok" -> 1L))
    assertThrows[RuntimeException] { Manifest.resolve(root, 1L, "missing") }
    assertThrows[IllegalArgumentException] { Manifest.pins(root, 5L) }
  }

  test("vacuum: tombstoned versions fail loudly; retainedPins tracks what survives") {
    val root = fresh("vacuum")
    Manifest.init(root, Map("index" -> 1L, "vectors" -> 1L))
    Manifest.publish(root, 1L, Map("index" -> 2L, "vectors" -> 1L))
    Manifest.publish(root, 2L, Map("index" -> 2L, "vectors" -> 2L))
    assert(Manifest.listVersions(root) === Seq(1L, 2L, 3L))
    assert(Manifest.retainedPins(root) ===
      Map("index" -> Set(1L, 2L), "vectors" -> Set(1L, 2L)))
    assert(Manifest.vacuum(root, keepLast = 2) === Seq(1L))
    assert(Manifest.listVersions(root) === Seq(2L, 3L))
    assertThrows[IllegalArgumentException] { Manifest.pins(root, 1L) }
    assert(Manifest.retainedPins(root) ===
      Map("index" -> Set(2L), "vectors" -> Set(1L, 2L)))
    // keepLast floor; idempotence once satisfied
    assertThrows[IllegalArgumentException] { Manifest.vacuum(root, 0) }
    assert(Manifest.vacuum(root, keepLast = 2).isEmpty)
  }

  test("vacuumStore never drops a generation a retained manifest version pins") {
    import graft.operators.GenStore
    val root = fresh("enforce")
    val store = Files.createTempDirectory("graft-manifest-store").toString + "/s"
    // a family-layout store with three published generations
    GenStore.init(store)
    (1L to 3L).foreach { g =>
      Files.createDirectories(java.nio.file.Paths.get(GenStore.genDir(store, g)))
      Files.write(java.nio.file.Paths.get(GenStore.genDir(store, g), "x"),
        g.toString.getBytes)
    }
    GenStore.writePointer(store, 3L)
    // the manifest's retained versions pin gen 2 (v2); gen 1 is unpinned
    Manifest.init(root, Map("s" -> 1L))
    Manifest.publish(root, 1L, Map("s" -> 2L))
    Manifest.publish(root, 2L, Map("s" -> 3L))
    Manifest.vacuum(root, keepLast = 2) // v1 (pin of gen 1) retired
    // keepLast=1 would drop gens 1 and 2 — but gen 2 is still pinned
    assert(Manifest.vacuumStore(root, "s", store, keepLast = 1) === Seq(1L))
    assert(GenStore.listGenerations(store) === Seq(2L, 3L))
    // retire v2, and the same vacuum may now drop gen 2
    Manifest.vacuum(root, keepLast = 1)
    assert(Manifest.vacuumStore(root, "s", store, keepLast = 1) === Seq(2L))
    assert(GenStore.listGenerations(store) === Seq(3L))
    // a store the manifest never pinned vacuums on the window alone
    assert(Manifest.vacuumStore(root, "unpinned", store, keepLast = 1).isEmpty)
  }

  test("an unpublished version directory above the pointer is invisible") {
    val root = fresh("unpub")
    Manifest.init(root, Map("index" -> 1L))
    // a crashed publish: pins written, pointer never moved
    val dir = java.nio.file.Paths.get(root, "v2")
    Files.createDirectories(dir)
    Files.write(dir.resolve("PINS"), "index=2".getBytes)
    assert(Manifest.currentVersion(root) === 1L)
    assert(Manifest.listVersions(root) === Seq(1L))
    assert(Manifest.retainedPins(root) === Map("index" -> Set(1L)))
    // the retry completes the publish and the version becomes visible
    assert(Manifest.publish(root, 1L, Map("index" -> 2L)) === 2L)
    assert(Manifest.listVersions(root) === Seq(1L, 2L))
  }

  test("the version directory is the publish lock: a second publisher with different pins fails loudly, never both succeed") {
    val root = fresh("lock")
    Manifest.init(root, Map("index" -> 1L))
    // publisher A won the v2 directory and wrote its pins, but has not
    // yet moved the pointer; publisher B planned against v1 too
    val dir = java.nio.file.Paths.get(root, "v2")
    Files.createDirectory(dir)
    Files.write(dir.resolve("PINS"), "index=7".getBytes)
    val e = intercept[IllegalStateException] {
      Manifest.publish(root, 1L, Map("index" -> 2L))
    }
    assert(e.getMessage.contains("lock"))
    assert(Manifest.currentVersion(root) === 1L,
      "the losing publisher must not have moved the pointer")
    // a publisher that raced the WINNER's pointer move no-ops to it
    Manifest.init(root + "2", Map("index" -> 1L))
    assert(Manifest.publish(root + "2", 1L, Map("index" -> 2L)) === 2L)
    assert(Manifest.publish(root + "2", 1L, Map("index" -> 9L)) === 2L)
    // an in-flight v-dir with NO pins yet is also a loud loss
    val root3 = fresh("lock3")
    Manifest.init(root3, Map("index" -> 1L))
    Files.createDirectory(java.nio.file.Paths.get(root3, "v2"))
    assertThrows[IllegalStateException] {
      Manifest.publish(root3, 1L, Map("index" -> 2L))
    }
  }
}
