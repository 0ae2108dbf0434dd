package agespark;

import org.apache.spark.sql.api.java.UDF2;

/**
 * age_decrypt_jvm(data BINARY, identity STRING) -&gt; BINARY — JVM-side
 * decrypt with one bech32 identity literal.  Error taxonomy mirrors the
 * reference surface: bad key strings raise "Invalid age identity key: ...",
 * any file/auth failure raises "Decryption failed: &lt;cause&gt;".
 */
public class AgeDecryptUDF implements UDF2<byte[], String, byte[]> {

    private record Parsed(java.security.PrivateKey sk, byte[] ourPub) {}

    // per-executor memo of identity string -> (private key, public share);
    // the base-point multiplication for ourPub is ~50 µs — once per key,
    // not once per row (mirrors the Python path's _identity_sk lru_cache,
    // same documented cache-residency trade-off)
    private static final java.util.concurrent.ConcurrentHashMap<String, Parsed> CACHE =
            new java.util.concurrent.ConcurrentHashMap<>();

    @Override
    public byte[] call(byte[] data, String identity) throws Exception {
        if (data == null || identity == null) return null;
        Parsed p = CACHE.get(identity);
        if (p == null) {
            try {
                byte[] raw = AgeCrypto.decodeIdentity(identity);
                java.security.PrivateKey sk = AgeCrypto.rawToPrivate(raw);
                p = new Parsed(sk, AgeCrypto.publicShare(sk));
            } catch (Exception e) {
                throw new IllegalArgumentException(
                        "Invalid age identity key: " + identity
                                + " (not a valid age key or secret name)");
            }
            // bound without flushing hot entries: past capacity new keys
            // just run unmemoized (real workloads decrypt with few keys)
            if (CACHE.size() < 64) CACHE.put(identity, p);
        }
        try {
            return AgeCrypto.decrypt(data, p.sk(), p.ourPub());
        } catch (IllegalArgumentException e) {
            throw new IllegalArgumentException("Decryption failed: " + e.getMessage());
        }
    }
}
