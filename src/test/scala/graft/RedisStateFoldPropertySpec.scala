package graft.operators

import scala.collection.mutable
import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import RedisStateOps.{commandOps, foldKey, packOpF, CommandRankBase,
  Op, ResetPoints, TombPrefix}

/** Property battery for the redis state fold: for ANY random command
  * script, the landed current-state face must equal an INDEPENDENT
  * straight-line interpreter of server semantics — per key, per type,
  * per flag — with conservatively-dropped keys (unmodelable writers)
  * showing as tombstones/absent and NEVER as partial state. Three
  * properties per script:
  *
  *  1. fold(script) == model(script) on every tracked key; untracked
  *     keys (RENAME dst, SMOVE dst, cross-key LMOVE dst, …) fold as
  *     tombstone-or-absent until a full-key write re-tracks them —
  *     the tombstone LIFECYCLE is part of the contract under test;
  *  2. window-split associativity: folding the ops in two windows
  *     (window 1's payload as window 2's base) equals one pass —
  *     the LandedTable cadence-merge shape;
  *  3. replay dedupe: double-landing window 2 changes nothing.
  *
  * The model is deliberately naive (immutable values in a map, no
  * sharing with the fold's St/packing/rank machinery): the property
  * exercises the COMPOSITION — op extraction, rank ordering, packing
  * round-trip, per-key sequencing, WRONGTYPE no-ops, numeric edges —
  * that hand vectors (RedisStateOpsSpec) can only sample.
  */
class RedisStateFoldPropertySpec extends AnyFunSuite {

  // ---- the independent model ----------------------------------------

  private sealed trait V
  private case class VS(v: String) extends V
  private case class VH(m: Map[String, String]) extends V
  private case class VSet(s: Set[String]) extends V
  private case class VZ(m: Map[String, Double]) extends V
  private case class VL(v: Vector[String]) extends V

  /** Score/float rendering mirroring the server's (and the payload
    * format's) conventions — re-implemented here on purpose.
    */
  private def rnum(d: Double): String =
    if (d.isInfinity) { if (d > 0) "inf" else "-inf" }
    else if (d == d.floor) d.toLong.toString
    else d.toString

  private def rscore(s: String): Option[Double] =
    s.toDoubleOption.orElse(s.trim.toLowerCase match {
      case "inf" | "+inf" | "infinity" | "+infinity" =>
        Some(Double.PositiveInfinity)
      case "-inf" | "-infinity" => Some(Double.NegativeInfinity)
      case _ => None
    })

  private final class Model {
    val vals = mutable.Map[String, V]()
    val ttl = mutable.Map[String, Long]() // the landed x HINT
    /** Keys whose command history contains an unmodelable write the
      * fold is CONTRACTED to drop (mirrors commandOps' drop rule);
      * cleared exactly by the tombstone-clearing writers.
      */
    val untracked = mutable.Set[String]()

    private def fullSet(k: String, v: String,
        keepTtl: Boolean = false): Unit = {
      vals(k) = VS(v)
      // a full SET re-tracks a dropped key, but the KEPT expiry was
      // part of the lost state — the documented x-hint loss
      if (!keepTtl || untracked(k)) ttl.remove(k)
      untracked -= k
    }
    private def del(k: String): Unit = {
      vals.remove(k); ttl.remove(k); untracked -= k
    }
    /** A container draining to empty removes the KEY but does NOT
      * re-track it: the fold clears tombstones only on an explicit
      * DEL/full SET — on a tombstoned key the emptying element ops
      * were no-ops, so the tombstone must survive.
      */
    private def emptied(k: String): Unit = {
      vals.remove(k); ttl.remove(k)
    }
    private def drop(k: String): Unit = untracked += k

    def apply(argv: Seq[String]): Unit = {
      val cmd = argv.head.toUpperCase
      def k = argv(1)
      cmd match {
        case "SET" =>
          if (argv.size == 3) fullSet(k, argv(2))
          else if (argv.lift(3).exists(_.equalsIgnoreCase("KEEPTTL")))
            fullSet(k, argv(2), keepTtl = true)
          else if (argv.lift(3).exists(_.equalsIgnoreCase("NX"))) {
            if (!vals.contains(k) && !untracked(k)) fullSet(k, argv(2))
            // NX on an untracked key: the fold keeps the tombstone;
            // on the true server the write may or may not happen —
            // the key simply STAYS untracked either way
          }
        case "SETNX" =>
          if (!vals.contains(k) && !untracked(k))
            fullSet(k, argv(2))
        case "GETSET" => fullSet(k, argv(2))
        case "GETDEL" => del(k)
        case "DEL" | "UNLINK" => argv.drop(1).foreach(del)
        case "APPEND" => vals.get(k) match {
          case Some(VS(v)) => vals(k) = VS(v + argv(2))
          case None => vals(k) = VS(argv(2))
          case _ => () // WRONGTYPE
        }
        case "INCRBY" | "DECRBY" =>
          val sgn = if (cmd == "DECRBY") -1 else 1
          argv(2).toLongOption.foreach { d0 =>
            val d = -BigInt(d0) * -sgn // negation-safe
            vals.get(k) match {
              case Some(VS(v)) => v.toLongOption.foreach { o =>
                val sum = BigInt(o) + d
                if (sum.isValidLong) vals(k) = VS(sum.toString)
              }
              case None =>
                if (d.isValidLong) vals(k) = VS(d.toString)
              case _ => ()
            }
          }
        case "INCRBYFLOAT" => vals.get(k) match {
          case Some(VS(v)) =>
            for (o <- v.toDoubleOption; d <- argv(2).toDoubleOption)
              if (java.lang.Double.isFinite(o + d))
                vals(k) = VS(rnum(o + d))
          case None => argv(2).toDoubleOption.foreach(d =>
            if (java.lang.Double.isFinite(d)) vals(k) = VS(rnum(d)))
          case _ => ()
        }
        case "SETRANGE" => argv(2).toIntOption.foreach { off =>
          if (off >= 0 && argv(3).nonEmpty) vals.get(k) match {
            case Some(VS(v)) =>
              val sb = new StringBuilder(v)
              while (sb.length < off) sb.append('\u0000')
              sb.replace(off,
                math.min(sb.length, off + argv(3).length), argv(3))
              vals(k) = VS(sb.toString)
            case None =>
              vals(k) =
                VS("\u0000" * off + argv(3))
            case _ => ()
          }
        }
        case "HSET" => vals.get(k) match {
          case Some(VH(m)) =>
            vals(k) = VH(m ++ argv.drop(2).grouped(2).collect {
              case Seq(f, v) => f -> v
            })
          case None =>
            vals(k) = VH(argv.drop(2).grouped(2).collect {
              case Seq(f, v) => f -> v
            }.toMap)
          case _ => ()
        }
        case "HSETNX" => vals.get(k) match {
          case Some(VH(m)) =>
            if (!m.contains(argv(2)))
              vals(k) = VH(m + (argv(2) -> argv(3)))
          case None => vals(k) = VH(Map(argv(2) -> argv(3)))
          case _ => ()
        }
        case "HDEL" => vals.get(k) match {
          case Some(VH(m)) =>
            val left = m -- argv.drop(2)
            if (left.isEmpty) emptied(k) else vals(k) = VH(left)
          case _ => ()
        }
        case "HINCRBY" => vals.get(k) match {
          case Some(VH(m)) =>
            for (o <- m.getOrElse(argv(2), "0").toLongOption;
                d <- argv(3).toLongOption) {
              val sum = BigInt(o) + BigInt(d)
              if (sum.isValidLong)
                vals(k) = VH(m + (argv(2) -> sum.toString))
            }
          case None => argv(3).toLongOption.foreach(d =>
            vals(k) = VH(Map(argv(2) -> d.toString)))
          case _ => ()
        }
        case "SADD" => vals.get(k) match {
          case Some(VSet(s)) => vals(k) = VSet(s ++ argv.drop(2))
          case None => vals(k) = VSet(argv.drop(2).toSet)
          case _ => ()
        }
        case "SREM" => vals.get(k) match {
          case Some(VSet(s)) =>
            val left = s -- argv.drop(2)
            if (left.isEmpty) emptied(k) else vals(k) = VSet(left)
          case _ => ()
        }
        case "SMOVE" =>
          // the fold drops dst UNCONDITIONALLY (commandOps cannot
          // see whether the member moved) — mirror that first
          drop(argv(2))
          vals.get(k) match {
            case Some(VSet(s)) if s.contains(argv(3)) =>
              val left = s - argv(3)
              if (left.isEmpty) emptied(k) else vals(k) = VSet(left)
              vals(argv(2)) = vals.get(argv(2)) match {
                case Some(VSet(d)) => VSet(d + argv(3))
                case _ => VSet(Set(argv(3)))
              }
            case _ => ()
          }
        case "ZADD" =>
          val flags = argv.drop(2).takeWhile(a =>
            Set("NX", "XX", "GT", "LT", "CH", "INCR")
              .contains(a.toUpperCase))
          val fs = flags.map(_.toUpperCase).toSet
          val nx = fs("NX"); val xx = fs("XX")
          val gt = fs("GT"); val lt = fs("LT")
          if (!((nx && (xx || gt || lt)) || (gt && lt))) {
            val pairs = argv.drop(2 + flags.size).grouped(2).collect {
              case Seq(s, m) => (s, m)
            }.toSeq
            if (!(fs("INCR") && pairs.size != 1))
              pairs.foreach { case (sv, m) =>
                rscore(sv).foreach { d =>
                  val z = vals.get(k) match {
                    case Some(VZ(zm)) => Some(zm)
                    case None => Some(Map.empty[String, Double])
                    case _ => None // WRONGTYPE
                  }
                  z.foreach { zm =>
                    val old = zm.get(m)
                    val score =
                      if (fs("INCR")) old.getOrElse(0.0) + d else d
                    if (!score.isNaN) {
                      val write = old match {
                        case None => !xx
                        case Some(p) => !nx &&
                          ((!gt && !lt) || (gt && score > p) ||
                            (lt && score < p))
                      }
                      if (write && (zm.nonEmpty || !xx ||
                          old.isDefined))
                        vals(k) = VZ(zm + (m -> score))
                    }
                  }
                }
              }
          }
        case "ZREM" => vals.get(k) match {
          case Some(VZ(m)) =>
            val left = m -- argv.drop(2)
            if (left.isEmpty) emptied(k) else vals(k) = VZ(left)
          case _ => ()
        }
        case "ZINCRBY" => vals.get(k) match {
          case Some(VZ(m)) => rscore(argv(2)).foreach { d =>
            val s = m.getOrElse(argv(3), 0.0) + d
            if (!s.isNaN) vals(k) = VZ(m + (argv(3) -> s))
          }
          case None => rscore(argv(2)).foreach(d =>
            if (!d.isNaN) vals(k) = VZ(Map(argv(3) -> d)))
          case _ => ()
        }
        case "LPUSH" | "RPUSH" => vals.get(k) match {
          case Some(VL(v)) =>
            vals(k) = VL(argv.drop(2).foldLeft(v)((acc, e) =>
              if (cmd == "LPUSH") e +: acc else acc :+ e))
          case None =>
            vals(k) = VL(argv.drop(2)
              .foldLeft(Vector.empty[String])((acc, e) =>
                if (cmd == "LPUSH") e +: acc else acc :+ e))
          case _ => ()
        }
        case "LPOP" | "RPOP" => vals.get(k) match {
          case Some(VL(v)) =>
            val n0 = argv.lift(2).map(_.toLongOption.getOrElse(-1L))
              .getOrElse(1L)
            if (n0 >= 0) {
              val n = math.min(n0, v.size.toLong).toInt
              val left =
                if (cmd == "LPOP") v.drop(n) else v.dropRight(n)
              if (left.isEmpty) emptied(k) else vals(k) = VL(left)
            }
          case _ => ()
        }
        case "LSET" => vals.get(k) match {
          case Some(VL(v)) => argv(2).toIntOption.foreach { i =>
            val idx = if (i < 0) v.size + i else i
            if (idx >= 0 && idx < v.size)
              vals(k) = VL(v.updated(idx, argv(3)))
          }
          case _ => ()
        }
        case "LREM" => vals.get(k) match {
          case Some(VL(v)) => argv(2).toLongOption.foreach { cnt =>
            def dropN(xs: Vector[String], n: Long) = {
              var left = n
              xs.filter { e =>
                if (left > 0 && e == argv(3)) { left -= 1; false }
                else true
              }
            }
            val left =
              if (cnt == 0) v.filterNot(_ == argv(3))
              else if (cnt > 0) dropN(v, cnt)
              else dropN(v.reverse, -cnt).reverse
            if (left.isEmpty) emptied(k) else vals(k) = VL(left)
          }
          case _ => ()
        }
        case "LTRIM" => vals.get(k) match {
          case Some(VL(v)) =>
            for (s0 <- argv(2).toLongOption;
                e0 <- argv(3).toLongOption) {
              val n = v.size.toLong
              val lo = math.min(
                math.max(if (s0 < 0) n + s0 else s0, 0L), n).toInt
              val hi = math.min(
                math.max(if (e0 < 0) n + e0 else e0, -1L),
                n - 1).toInt
              val left =
                if (lo > hi) Vector.empty else v.slice(lo, hi + 1)
              if (left.isEmpty) emptied(k) else vals(k) = VL(left)
            }
          case _ => ()
        }
        case "LINSERT" => vals.get(k) match {
          case Some(VL(v)) =>
            val i = v.indexOf(argv(3))
            if (i >= 0) {
              val at =
                if (argv(2).equalsIgnoreCase("BEFORE")) i else i + 1
              vals(k) = VL((v.take(at) :+ argv(4)) ++ v.drop(at))
            }
          case _ => ()
        }
        case "LMOVE" =>
          val (src, dst) = (argv(1), argv(2))
          def side(a: String) = a.equalsIgnoreCase("LEFT")
          if (src == dst) vals.get(src) match {
            case Some(VL(v)) if v.nonEmpty =>
              if (side(argv(3)) && !side(argv(4)))
                vals(src) = VL(v.tail :+ v.head)
              else if (!side(argv(3)) && side(argv(4)))
                vals(src) = VL(v.last +: v.init)
            case _ => ()
          } else {
            vals.get(src) match {
              case Some(VL(v)) if v.nonEmpty =>
                val (popped, left) =
                  if (side(argv(3))) (v.head, v.tail)
                  else (v.last, v.init)
                if (left.isEmpty) emptied(src)
                else vals(src) = VL(left)
                vals(dst) = vals.get(dst) match {
                  case Some(VL(d)) =>
                    if (side(argv(4))) VL(popped +: d)
                    else VL(d :+ popped)
                  case _ => VL(Vector(popped))
                }
              case _ => ()
            }
            drop(dst) // fold drops dst unconditionally
          }
        case "RENAME" => vals.get(k) match {
          case Some(v) =>
            vals(argv(2)) = v
            ttl.get(k).foreach(ttl(argv(2)) = _)
            vals.remove(k); ttl.remove(k); untracked -= k
            drop(argv(2))
          case None => ()
        }
        case "EXPIRE" | "PEXPIRE" =>
          if (vals.contains(k)) argv(2).toLongOption.foreach(v =>
            ttl(k) = if (cmd == "EXPIRE") v * 1000L else v)
        case "PERSIST" => if (vals.contains(k)) ttl.remove(k): Unit
        case "SINTERSTORE" =>
          // dst := src ∩ src (i.e. src) — fold-dropped regardless
          vals.get(argv(2)) match {
            case Some(VSet(s)) => vals(k) = VSet(s)
            case _ => vals.remove(k): Unit
          }
          drop(k)
        case other => fail(s"model has no case for $other")
      }
    }

    /** Expected payload JSON for a tracked key (None = absent). */
    def expected(k: String): Option[String] = vals.get(k).map { v =>
      def esc(s: String): String = s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < 0x20 => f"\\u${c.toInt}%04x"
        case c => c.toString
      }
      val x = ttl.get(k).map(t => s""","x":$t""").getOrElse("")
      def elems(ps: Seq[(String, String)]): String =
        ps.map { case (f, v2) =>
          s"""["${esc(f)}","${esc(v2)}"]"""
        }.mkString(",")
      v match {
        case VS(s) =>
          s"""{"t":"string"$x,"e":[["","${esc(s)}"]]}"""
        case VH(m) =>
          s"""{"t":"hash"$x,"e":[${elems(m.toSeq.sortBy(_._1))}]}"""
        case VSet(s) =>
          s"""{"t":"set"$x,"e":[${
            elems(s.toSeq.sorted.map(_ -> ""))}]}"""
        case VZ(m) =>
          s"""{"t":"zset"$x,"e":[${
            elems(m.toSeq.sortBy(_._1)
              .map { case (f, d) => f -> rnum(d) })}]}"""
        case VL(vv) =>
          s"""{"t":"list"$x,"e":[${
            elems(vv.zipWithIndex.map { case (e, i) =>
              f"$i%06d" -> e
            })}]}"""
      }
    }
  }

  // ---- script generation ---------------------------------------------

  private val keys = Vector("k0", "k1", "k2", "k3", "k4", "k5")

  private def randomCommand(rnd: Random, model: Model): Seq[String] = {
    def key = keys(rnd.nextInt(keys.size))
    def v = "v" + rnd.nextInt(40)
    def member = "m" + rnd.nextInt(6)
    def field = "f" + rnd.nextInt(6)
    def score = rnd.nextInt(12) match {
      case 0 => "inf"
      case 1 => "-inf"
      case n if n < 6 => (rnd.nextInt(21) - 10).toString
      case _ => f"${rnd.nextDouble() * 20 - 10}%.2f"
    }
    rnd.nextInt(34) match {
      case 0 => Seq("SET", key, v)
      case 1 => Seq("SET", key, v, "KEEPTTL")
      case 2 => Seq("SET", key, v, "NX")
      case 3 => Seq("SETNX", key, v)
      case 4 => Seq("APPEND", key, v)
      case 5 => Seq(if (rnd.nextBoolean()) "INCRBY" else "DECRBY",
        key, (rnd.nextInt(200) - 100).toString)
      case 6 => Seq("INCRBYFLOAT", key, f"${rnd.nextDouble()}%.2f")
      case 7 => Seq("SETRANGE", key, rnd.nextInt(8).toString, v)
      case 8 => Seq("HSET", key, field, v, field, v + "b")
      case 9 => Seq("HSETNX", key, field, v)
      case 10 => Seq("HDEL", key, field, field)
      case 11 => Seq("HINCRBY", key, field,
        (rnd.nextInt(20) - 10).toString)
      case 12 => Seq("SADD", key, member, member, "m" + rnd.nextInt(6))
      case 13 => Seq("SREM", key, member)
      case 14 => Seq("SMOVE", key, keys(rnd.nextInt(keys.size)),
        member)
      case 15 =>
        val flags = rnd.nextInt(6) match {
          case 0 => Seq("NX")
          case 1 => Seq("XX")
          case 2 => Seq("GT")
          case 3 => Seq("LT", "CH")
          case 4 => Seq("XX", "GT", "INCR")
          case _ => Seq.empty
        }
        Seq("ZADD", key) ++ flags ++ Seq(score, member)
      case 16 => Seq("ZREM", key, member)
      case 17 => Seq("ZINCRBY", key, score, member)
      case 18 => Seq("LPUSH", key, v, v + "b")
      case 19 => Seq("RPUSH", key, v, v + "c")
      case 20 => Seq("LPOP", key)
      case 21 => Seq("RPOP", key, rnd.nextInt(3).toString)
      case 22 => Seq("LSET", key, (rnd.nextInt(5) - 2).toString, v)
      case 23 => Seq("LREM", key, (rnd.nextInt(5) - 2).toString, v)
      case 24 => Seq("LTRIM", key, (rnd.nextInt(4) - 1).toString,
        (rnd.nextInt(5) - 2).toString)
      case 25 => Seq("LINSERT", key,
        if (rnd.nextBoolean()) "BEFORE" else "AFTER", v, v + "i")
      case 26 =>
        val a = key
        val b = if (rnd.nextInt(3) == 0) a else keys(rnd.nextInt(6))
        Seq("LMOVE", a, b,
          if (rnd.nextBoolean()) "LEFT" else "RIGHT",
          if (rnd.nextBoolean()) "LEFT" else "RIGHT")
      case 27 => Seq("DEL", key, keys(rnd.nextInt(keys.size)))
      case 28 => Seq("EXPIRE", key, (rnd.nextInt(100) + 1).toString)
      case 29 => Seq("PERSIST", key)
      case 30 => Seq("GETSET", key, v)
      case 31 => Seq("GETDEL", key)
      case 32 =>
        // only emit server-SUCCESSFUL renames — failures never
        // reach a replication stream (`key` is a def: bind ONCE or
        // the guard checks a different key than it renames)
        val src = key
        if (model.vals.contains(src) && !model.untracked(src))
          Seq("RENAME", src, keys(rnd.nextInt(keys.size)))
        else Seq("SET", src, v)
      case _ => Seq("SINTERSTORE", key,
        keys(rnd.nextInt(keys.size)))
    }
  }

  // ---- the fold harness ----------------------------------------------

  private val noResets = new ResetPoints(Map.empty)

  private def packWindow(cmds: Seq[Seq[String]],
      sseg: String): Map[String, Seq[String]] = {
    var rank = CommandRankBase
    val byKey = mutable.Map[String, mutable.Buffer[String]]()
    cmds.foreach { argv =>
      val (_, ops) = commandOps(argv, 0L)
      ops.foreach { o =>
        rank += 1
        byKey.getOrElseUpdate(o.key, mutable.Buffer()) +=
          packOpF(sseg, rank, o.op, o.vtype, o.field, o.value,
            o.ex.map(Long.box).orNull)
      }
    }
    byKey.view.mapValues(_.toSeq.sorted).toMap
  }

  private def foldAll(base: Map[String, String],
      packed: Map[String, Seq[String]]): Map[String, String] = {
    val all = base.keySet ++ packed.keySet
    all.flatMap { k =>
      Option(foldKey(k, base.get(k).orNull,
        packed.get(k).map(_.toSeq).orNull, noResets)).map(k -> _)
    }.toMap
  }

  test("fold(random script) == independent server model, with the " +
      "tombstone lifecycle exact; window-split and replay-dedupe " +
      "invariants hold") {
    var scripts = 0
    var tombChecks = 0
    for (seed <- 1 to 120) {
      val rnd = new Random(seed * 7919L)
      val model = new Model
      // generate and apply INTERLEAVED: success-guarded commands
      // (RENAME) consult the model's state as of their position
      val cmds = mutable.Buffer[Seq[String]]()
      for (_ <- 0 until 45) {
        val c = randomCommand(rnd, model)
        model.apply(c)
        cmds += c
      }
      val script = cmds.toSeq
      scripts += 1

      // single-pass fold over the whole script
      val onePass = foldAll(Map.empty,
        packWindow(script, "psync.000001.log"))

      // every key the script could have touched
      for (k <- keys) {
        val sk = RedisStateOps.stateKey(0, k)
        val folded = onePass.get(sk)
        if (model.untracked(k)) {
          tombChecks += 1
          assert(folded.forall(_.startsWith(TombPrefix)),
            s"seed=$seed untracked key $k folded as real state: " +
              s"${folded.orNull}\nscript: ${cmds.mkString("; ")}")
        } else {
          val want = model.expected(k)
          assert(folded == want,
            s"seed=$seed key=$k\n fold: ${folded.orNull}\n" +
              s" want: ${want.orNull}\nscript: " +
              cmds.map(_.mkString(" ")).mkString("; "))
        }
      }

      // window-split associativity: cadence merges compose
      val cut = rnd.nextInt(script.size)
      val w1 = foldAll(Map.empty,
        packWindow(script.take(cut), "psync.000001.log"))
      val w2packed = packWindow(script.drop(cut), "psync.000002.log")
      val split = foldAll(w1, w2packed)
      assert(split == onePass,
        s"seed=$seed window split at $cut diverged")

      // replay dedupe: double-landing window 2 changes nothing
      val doubled = w2packed.view
        .mapValues(ops => (ops ++ ops).sorted).toMap
      assert(foldAll(w1, doubled) == onePass,
        s"seed=$seed replayed window 2 diverged")
    }
    assert(scripts == 120)
    assert(tombChecks > 50, s"tombstone lifecycle under-exercised: " +
      s"$tombChecks checks")
  }
}
