package agespark;

import java.security.PublicKey;
import java.util.List;
import org.apache.spark.sql.api.java.UDF2;

/**
 * age_encrypt_multi_jvm(data BINARY, recipients ARRAY&lt;STRING&gt;) -&gt; BINARY —
 * JVM-side multi-recipient encrypt (one file key, N stanzas, any identity
 * decrypts).  Per-element dispatch matches functions.py::encrypt_multi_kernel:
 * "age1"-prefixed elements are bech32 literals, anything else is a secret
 * NAME resolved against the registration-time {@link AgeSecretRegistry}
 * snapshot carried in the serialized closure (VERDICT r10 item 3 — named
 * plans carry no key material).  Error taxonomy mirrors
 * functions.py::encrypt_multi_kernel / errors.py exactly so the SQL surface
 * is indistinguishable from the Python path.
 */
public class AgeEncryptMultiUDF implements UDF2<byte[], scala.collection.Seq<String>, byte[]> {

    private record Parsed(byte[] raw, PublicKey key) {}

    // per-executor memo of bech32 string -> parsed key, same policy as
    // AgeEncryptUDF: bounded, never flushed (real workloads use few keys)
    private static final java.util.concurrent.ConcurrentHashMap<String, Parsed> CACHE =
            new java.util.concurrent.ConcurrentHashMap<>();

    // name -> recipient, snapshotted at construction (= registration) time
    private final java.util.HashMap<String, String> named =
            AgeSecretRegistry.recipientsSnapshot();

    // staging fingerprint snapshotted with the map (ADVICE r11): see
    // AgeSecretRegistry.unwrapName
    private final String token = AgeSecretRegistry.tokenSnapshot();

    @Override
    public byte[] call(byte[] data, scala.collection.Seq<String> recipients) throws Exception {
        if (data == null || recipients == null) return null;
        List<String> keys = scala.jdk.javaapi.CollectionConverters.asJava(recipients);
        if (keys.isEmpty()) {
            throw new IllegalArgumentException("Recipients list cannot be empty");
        }
        // TWO passes to match functions.py::encrypt_multi_kernel's error
        // precedence exactly (code-review r11): the Python kernel resolves
        // EVERY name before parsing ANY element, so a bad literal at
        // position 0 must not mask an unknown name at position 1.
        String[] lits = new String[keys.size()];
        for (int i = 0; i < keys.size(); i++) {
            String k = AgeSecretRegistry.unwrapName(keys.get(i), token);
            if (k == null) {
                // NULL element: the Python path's resolver treats it as an
                // unresolvable recipient (errors.invalid_recipient)
                throw new IllegalArgumentException("Invalid recipient: null");
            }
            if (!k.startsWith("age1")) {
                String resolved = named.get(k);
                if (resolved == null) {
                    // unknown name (errors.invalid_recipient — the multi
                    // kernel's per-element resolution message)
                    throw new IllegalArgumentException("Invalid recipient: " + k);
                }
                k = resolved;
            }
            lits[i] = k;
        }
        byte[][] raws = new byte[keys.size()][];
        PublicKey[] pubs = new PublicKey[keys.size()];
        for (int i = 0; i < keys.size(); i++) {
            String k = lits[i];
            Parsed p = CACHE.get(k);
            if (p == null) {
                try {
                    byte[] raw = AgeCrypto.decodeRecipient(k);
                    p = new Parsed(raw, AgeCrypto.rawToPublic(raw));
                } catch (Exception e) {
                    // resolved-key parse failure → positional taxonomy
                    // (errors.encryption_failed_invalid_recipient_at)
                    throw new IllegalArgumentException(
                            "Encryption failed: Invalid recipient at position " + i + ": " + k);
                }
                if (CACHE.size() < 256) CACHE.put(k, p);
            }
            raws[i] = p.raw();
            pubs[i] = p.key();
        }
        return AgeCrypto.encryptMulti(data, raws, pubs);
    }
}
