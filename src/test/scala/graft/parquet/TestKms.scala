package graft.parquet

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.crypto.keytools.KmsClient

import java.util.Base64

/**
 * Trivial in-memory KMS for tests: "wraps" data keys by XOR with the master
 * key then base64. Only used to produce encrypted parquet fixtures; never a
 * real key-management scheme.
 */
class TestKms extends KmsClient {
  private var masterKeys: Map[String, Array[Byte]] = Map.empty

  override def initialize(configuration: Configuration, kmsInstanceID: String,
                          kmsInstanceURL: String, accessToken: String): Unit = {
    // key list format mirrors parquet.encryption.key.list: "id:base64, ..."
    masterKeys = Option(configuration.getTrimmedStrings("graft.test.kms.keys"))
      .map(_.toSeq).getOrElse(Seq.empty)
      .map { kv =>
        val Array(id, b64) = kv.split(":", 2)
        id -> Base64.getDecoder.decode(b64)
      }.toMap
  }

  private def xor(data: Array[Byte], key: Array[Byte]): Array[Byte] =
    data.zipWithIndex.map { case (b, i) => (b ^ key(i % key.length)).toByte }

  override def wrapKey(keyBytes: Array[Byte], masterKeyIdentifier: String): String =
    Base64.getEncoder.encodeToString(xor(keyBytes, masterKeys(masterKeyIdentifier)))

  override def unwrapKey(wrappedKey: String, masterKeyIdentifier: String): Array[Byte] =
    xor(Base64.getDecoder.decode(wrappedKey), masterKeys(masterKeyIdentifier))
}
