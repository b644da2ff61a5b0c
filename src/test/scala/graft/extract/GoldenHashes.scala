package graft.extract

/** Golden sha256 hex of extracted text for the seed-42 fixture pages,
  * cut ONCE from extractor-v1 (GoldenCut). These freeze the per-url
  * byte-identical-extraction invariant (BASELINE.json input_hint). */
object GoldenHashes {
  val pages0to3: Seq[String] = Seq(
    "d40c7f48f95a87f0afc73ae2bb0bb059d505cff19fbcee98c51f1795a329b3a3",
    "da036f7db109c9f9cd319d9c5fadd9f54c6df4e4d891add5f17bd0714d7440a3",
    "2523fd895fabe1e9fbeec1cd1bdd469b307c0b8adbdd59503880e028d693e415",
    "3704182b2c00d5ed99dfc931a9ad70bc8d46c01aa128e1cdca3833737a6401c9")
}
