package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

import graft.sources.KvSchema

/** Randomized round-trip for the line format's ARRAY dialect
  * (formatRow → parseRow → materializeExtra), in ugly-double
  * territory: ±0.0, NaN, ±Infinity, denormals, full-precision
  * mantissas, Long.Min/Max, null elements, empty and null arrays,
  * both element types side by side in one row. Bit-exactness is the
  * bar (doubleToRawLongBits), because a stored embedding that drifts
  * one ulp through its own lakehouse would silently change every
  * downstream similarity. Fixed seeds, CanonicalPropsSpec pattern.
  */
class KvArrayPropsSpec extends AnyFunSuite {

  private val dblGen: Gen[Double] = Gen.frequency(
    5 -> Gen.chooseNum(-1e6, 1e6),
    2 -> Gen.chooseNum(-1.0, 1.0).map(x => x * 1e-300), // denormal-ish
    2 -> Gen.chooseNum(-1.0, 1.0).map(x => x * 1e300),
    1 -> Gen.const(0.0),
    1 -> Gen.const(-0.0),
    1 -> Gen.const(Double.NaN),
    1 -> Gen.const(Double.PositiveInfinity),
    1 -> Gen.const(Double.NegativeInfinity),
    1 -> Gen.const(Double.MinPositiveValue),
    1 -> Gen.const(java.lang.Math.nextUp(1.0)))

  private val lngGen: Gen[Long] = Gen.frequency(
    6 -> Gen.chooseNum(Long.MinValue, Long.MaxValue),
    1 -> Gen.const(0L),
    1 -> Gen.const(Long.MinValue),
    1 -> Gen.const(Long.MaxValue))

  private def arr[T](g: Gen[T]): Gen[Option[Array[Any]]] =
    Gen.frequency(
      1 -> Gen.const(None),
      1 -> Gen.const(Some(Array.empty[Any])),
      8 -> Gen.chooseNum(1, 12).flatMap(n =>
        Gen.listOfN(n, Gen.frequency(
          6 -> g.map(v => v: Any),
          1 -> Gen.const(null: Any)))
          .map(l => Some(l.toArray))))

  private val cols = Seq(
    KvSchema.Col(1, "key", LongType),
    KvSchema.Col(3, "emb", ArrayType(DoubleType, true)),
    KvSchema.Col(4, "ids", ArrayType(LongType, true)))

  test("formatRow → parseRow round-trips random arrays bit-exactly") {
    val rowGen = for {
      k <- lngGen
      emb <- arr(dblGen)
      ids <- arr(lngGen)
    } yield (k, emb, ids)
    val params = Gen.Parameters.default
    val cases = (0 until 500)
      .flatMap(i => rowGen.apply(params, Seed(0x17A55L + i)).toSeq)
    assert(cases.size >= 400)
    cases.foreach { case (k, emb, ids) =>
      val line = KvSchema.formatRow(
        InternalRow(
          k,
          emb.map(a => new GenericArrayData(a)).orNull,
          ids.map(a => new GenericArrayData(a)).orNull),
        cols)
      val (kBack, _, extras) = KvSchema.parseRow(line)
      assert(kBack.contains(k))
      def back(storage: String, dt: ArrayType): Option[GenericArrayData] =
        extras.get(storage).map(x =>
          KvSchema.materializeExtra(x, dt, storage)
            .asInstanceOf[GenericArrayData])
      (emb, back("c3", ArrayType(DoubleType, true))) match {
        case (None, got) => assert(got.isEmpty, s"null emb read as $got")
        case (Some(want), Some(got)) =>
          assert(got.numElements() == want.length, s"len drift: $line")
          want.indices.foreach { i =>
            (want(i), got.isNullAt(i)) match {
              case (null, isNull) => assert(isNull, s"null drift: $line")
              case (d: Double, false) =>
                assert(java.lang.Double.doubleToRawLongBits(
                  got.getDouble(i)) ==
                  java.lang.Double.doubleToRawLongBits(d),
                  s"double bits drift at $i: $d vs " +
                    s"${got.getDouble(i)} in $line")
              case other => fail(s"shape drift $other in $line")
            }
          }
        case (want, got) => fail(s"presence drift: $want vs $got")
      }
      (ids, back("c4", ArrayType(LongType, true))) match {
        case (None, got) => assert(got.isEmpty)
        case (Some(want), Some(got)) =>
          assert(got.numElements() == want.length)
          want.indices.foreach { i =>
            (want(i), got.isNullAt(i)) match {
              case (null, isNull) => assert(isNull)
              case (l: Long, false) => assert(got.getLong(i) == l,
                s"long drift at $i in $line")
              case other => fail(s"shape drift $other in $line")
            }
          }
        case (want, got) => fail(s"presence drift: $want vs $got")
      }
    }
  }

  test("string arrays round-trip adversarial content exactly") {
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val strGen: Gen[String] = Gen.frequency(
      4 -> Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString),
      1 -> Gen.const(""),
      1 -> Gen.const("null"), // the literal word, quoted ≠ null token
      1 -> Gen.const("\"quoted\""),
      1 -> Gen.const("""back\slash"""),
      1 -> Gen.const("a,b]c[d"), // structural chars inside a string
      1 -> Gen.const("line\nbreak\ttab\rret"),
      1 -> Gen.const("ünïcødé ☃ "),
      1 -> Gen.const("{\"key\":1}")) // a fake line inside an element
    val sCols = Seq(
      KvSchema.Col(1, "key", LongType),
      KvSchema.Col(5, "toks", ArrayType(StringType, true)))
    val rowGen = for { k <- lngGen; a <- arr(strGen) } yield (k, a)
    val params = Gen.Parameters.default
    val cases = (0 until 500)
      .flatMap(i => rowGen.apply(params, Seed(0x57A9L + i)).toSeq)
    assert(cases.size >= 400)
    cases.foreach { case (k, toks) =>
      val line = KvSchema.formatRow(
        InternalRow(
          k,
          toks.map(a => new GenericArrayData(
            a.map(x => if (x == null) null
              else UTF8String.fromString(x.asInstanceOf[String]))))
            .orNull),
        sCols)
      val (kBack, _, extras) = KvSchema.parseRow(line)
      assert(kBack.contains(k))
      (toks, extras.get("c5").map(x =>
        KvSchema.materializeExtra(x, ArrayType(StringType, true), "c5")
          .asInstanceOf[GenericArrayData])) match {
        case (None, got) => assert(got.isEmpty, s"null read as $got")
        case (Some(want), Some(got)) =>
          assert(got.numElements() == want.length, s"len drift: $line")
          want.indices.foreach { i =>
            (want(i), got.isNullAt(i)) match {
              case (null, isNull) => assert(isNull, s"null drift: $line")
              case (s: String, false) =>
                assert(got.getUTF8String(i).toString == s,
                  s"string drift at $i: '$s' vs " +
                    s"'${got.getUTF8String(i)}' in $line")
              case other => fail(s"shape drift $other in $line")
            }
          }
        case (want, got) => fail(s"presence drift: $want vs $got")
      }
    }
  }

  test("truncated array tokens fail with the contractual message") {
    // a corrupt/truncated line must raise the format's
    // IllegalArgumentException, never a StringIndexOutOfBounds —
    // every cut point of a valid array token stream
    val fulls = Seq(
      """{"key":1,"value":null,"c3":[1.0,2.5,null,3.0]}""",
      """{"key":1,"value":null,"c5":["a\"b",null,"c,]d"]}""")
    // 22 = first byte after the founding (key, value) prefix — every
    // cut point of the extras/array token stream
    for (full <- fulls; cut <- 22 until full.length) {
      val line = full.substring(0, cut)
      // IllegalArgumentException (NumberFormatException included, for
      // a cut mid-token) — never an index error
      intercept[IllegalArgumentException](
        graft.sources.KvSchema.parseRow(line))
    }
  }
}
