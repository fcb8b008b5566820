package graft

import graft.sinks.RedisReshard
import graft.sinks.RedisReshard.{Move, SlotRange}

class RedisReshardSpec extends SparkSuite {
  import spark.implicits._

  test("crc16 slots match the Redis cluster spec vectors") {
    // published reference points: CRC16("123456789") = 0x31C3 (XMODEM
    // check value), and the {hashtag} rule
    assert(RedisReshard.crc16("123456789".getBytes("UTF-8")) == 0x31c3)
    assert(RedisReshard.slotOf("123456789") == 0x31c3 % 16384)
    // same tag → same slot regardless of surrounding key text
    assert(RedisReshard.slotOf("{user1000}.following") ==
      RedisReshard.slotOf("{user1000}.followers"))
    // empty tag falls back to whole key
    assert(RedisReshard.slotOf("foo{}bar") != RedisReshard.slotOf(""))
    // unmatched brace falls back to whole key
    assert(RedisReshard.slotOf("foo{bar") == RedisReshard.slotOf("foo{bar"))
  }

  test("reshard plan emits contiguous runs only for reassigned slots") {
    val before = Seq(SlotRange(0, 8191, "n1"), SlotRange(8192, 16383, "n2"))
    val after = Seq(SlotRange(0, 4095, "n1"), SlotRange(4096, 8191, "n3"),
      SlotRange(8192, 16383, "n2"))
    val plan = RedisReshard.plan(before, after)
    assert(plan == Seq(Move(4096, 8191, "n1", "n3")))
    // unchanged topology → empty plan
    assert(RedisReshard.plan(before, before).isEmpty)
  }

  test("keyMoves tags each key with source/target node") {
    val before = Seq(SlotRange(0, 8191, "n1"), SlotRange(8192, 16383, "n2"))
    val after = Seq(SlotRange(0, 8191, "n2"), SlotRange(8192, 16383, "n2"))
    val keys = Seq("k1", "k2", "{user1000}.following", "cart:42")
      .toDF("key")
    val tagged = RedisReshard.keyMoves(keys, "key", before, after)
      .collect()
    assert(tagged.length == 4)
    tagged.foreach { r =>
      val slot = r.getAs[Int]("slot")
      val expectMove = slot <= 8191
      assert(r.getAs[Boolean]("moves") == expectMove)
      assert(r.getAs[String]("to_node") == "n2")
    }
  }
}
